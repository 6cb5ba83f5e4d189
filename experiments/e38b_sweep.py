import sys
sys.path.insert(0, "/root/repo")
from e38_stacked import chain_rate, log, N, Q
import jax
import numpy as np
from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT

tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                   fuse_pointwise=True, stack_forward=True)
for B in (32, 40, 48, 56):
    rate, t_at = chain_rate(tp, B)
    log(stack=True, B=B, rate=round(rate, 1),
        us_per_elem=round(1e6 / rate, 1),
        t_at={str(k): round(v, 4) for k, v in t_at.items()})
