"""Golden-vector and structural tests for the pure-Python spec layer.

The hard-coded vectors are ported verbatim from the Rust reference test
modules (values are canonical integers — `MontFp!`/`Fq::new` literals):

* goldilocks:  crates/ring/src/cyclotomic_ring/models/goldilocks/ntt.rs:564-787
* frog:        models/frog_ring/ntt.rs:388-563
* stark_prime: models/stark_prime/ntt.rs:377-545
* babybear:    models/babybear/ntt.rs:867-1019
"""

import random

from stark_rings_tpu.spec import MODELS, get_model
from stark_rings_tpu.spec.field import modinv

GL = get_model("goldilocks")
BB = get_model("babybear")
FR = get_model("frog")
SP = get_model("stark_prime")


# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------


def test_goldilocks_constants():
    q = GL.q
    assert q == 18446744069414584321
    # ROOTS_OF_UNITY_24 spot checks (goldilocks/ntt.rs:15-40)
    assert GL.roots[1] == 1099511627776
    assert GL.roots[2] == 281474976645120
    assert GL.roots[4] == 18446744065119617026
    assert GL.roots[12] == q - 1
    assert GL.roots[23] == 18374686475376656385
    # KAPPA literal at ntt.rs:42-43 is in fact (2*roots[4] - 1)^-1
    assert modinv(2 * GL.roots[4] - 1, q) == 12297829382473034411
    assert modinv(8, q) == 16140901060737761281
    assert modinv(4, q) == 13835058052060938241
    # nonresidue has order 24 (goldilocks/mod.rs:194-206)
    assert pow(GL.root, 24, q) == 1
    assert all(pow(GL.root, i, q) != 1 for i in range(1, 24))


def test_babybear_constants():
    q = BB.q
    assert q == 2013265921
    assert BB.roots[1] == 503591070
    assert BB.roots[12] == q - 1
    # note: the reference table's "power =" comments at ntt.rs:34-35 are
    # swapped; the values are in index order (asserted by the reference's own
    # test_babybear_roots_of_unity, ntt.rs:617-620)
    assert BB.roots[17] == 1297951657
    assert BB.roots[18] == 284861408
    assert BB.roots[23] == 194344969
    # KAPPA = (2*roots[4]-1)^-1 (babybear/ntt.rs:136-137)
    assert modinv(2 * BB.roots[4] - 1, q) == 1807872479
    assert modinv(8, q) == 1761607681
    assert modinv(4, q) == 1509949441


def test_frog_constants():
    q = FR.q
    assert q == 15912092521325583641
    assert FR.roots[1] == 2755067726615789629
    assert FR.roots[4] == q - 1
    assert FR.roots[7] == 7868499799050805341
    assert modinv(4, q) == 11934069390994187731


def test_stark_constants():
    q = SP.q
    assert q == 3618502788666131213697322783095070105623107215331596699973092056135872020481
    assert SP.roots[16] == q - 1
    assert SP.roots[31] == (
        1671060588858896057687527512886504157667406782314616243536105453864585260865
    )
    assert modinv(16, q) == (
        3392346364374498012841240109151628224021663014373371906224773802627380019201
    )
    assert modinv(16, q) * SP.roots[24] % q == (
        504765161781728009636509731382573222878806373017743751424709412819153374338
    )


def test_roots_orders():
    for m in MODELS.values():
        for i, r in enumerate(m.roots):
            assert r == pow(m.root, i, m.q)
        assert pow(m.root, m.root_order, m.q) == 1
        assert len(set(m.roots)) == len(m.roots)


# ---------------------------------------------------------------------------
# goldilocks golden vectors
# ---------------------------------------------------------------------------

GL_POLY1 = [1, 2, 3] + [0] * 12 + [15] + [0] * 7 + [1]
GL_RAW1 = [
    3841, 2, 72057594021150723,
    18446744069414580482, 2, 18374686475393433604,
    1080863910568919041, 2, 1099511627779,
    17365880158845665282, 2, 18446742969902956548,
    16492674416641, 2, 72057594037927939,
    18446727576740167682, 2, 18374686475376656388,
    1080863910317260801, 2, 259,
    17365880159097323522, 2, 18446744069414584068,
]

GL_POLY2 = [2342, 543543, 3, 325, 0, 235325325, 765568568] + [0] * 17
GL_RAW2 = [
    11977680547482164101, 543543, 488514175862046709,
    11976965864924109701, 543543, 17958229893552537618,
    11441394850670851783, 543543, 10160120756981332284,
    1497446875752052425, 543543, 8286623312433252043,
    50172301757990, 543543, 60243283203,
    50172301591590, 543543, 18446744009171301124,
    4971923820610324773, 543543, 10164068860789127484,
    13474719904200919336, 543543, 8282675208625456843,
]


def _homogenized(model, raw):
    c = list(raw)
    model.crt_stages[-1](c)
    return c


def test_goldilocks_crt_golden():
    assert GL.crt_raw(GL_POLY1) == GL_RAW1
    assert GL.crt_raw(GL_POLY2) == GL_RAW2


def test_goldilocks_icrt_golden():
    assert GL.icrt(_homogenized(GL, GL_RAW1)) == GL_POLY1
    assert GL.icrt(_homogenized(GL, GL_RAW2)) == GL_POLY2


# ---------------------------------------------------------------------------
# frog golden vectors
# ---------------------------------------------------------------------------

FR_POLY1 = [1, 2, 3] + [0] * 12 + [15]
FR_RAW1 = [
    1, 2, 3, 9269243184842589013,
    1, 2, 3, 6642849336482994628,
    1, 2, 3, 9501830856585677153,
    1, 2, 3, 6410261664739906488,
]

FR_POLY2 = [2342, 543543, 3, 325, 0, 235325325, 765568568] + [0] * 9
FR_RAW2 = [
    2342, 843289782635822351, 9218688620283687143, 325,
    2342, 15068802738690848376, 6693403901041896504, 325,
    2342, 12113166087288599489, 3527640652310596771, 325,
    2342, 3798926434038071238, 12384451869014986876, 325,
]


def test_frog_crt_golden():
    assert FR.crt_raw(FR_POLY1) == FR_RAW1
    assert FR.crt_raw(FR_POLY2) == FR_RAW2


def test_frog_icrt_golden():
    assert FR.icrt(_homogenized(FR, FR_RAW1)) == FR_POLY1
    assert FR.icrt(_homogenized(FR, FR_RAW2)) == FR_POLY2


# ---------------------------------------------------------------------------
# stark prime golden vectors (fully splitting — no homogenize)
# ---------------------------------------------------------------------------

SP_POLY1 = [1, 2, 3] + [0] * 12 + [15]
SP_EVAL1 = [
    645567075879839201317982428175614860863887056415581724161883453888590511158,
    954581386842844617990350588793859972457388686372942226298498503178516390686,
    3256862904360112534622944024048777964481830288622596035686455700740188841883,
    2379994210249466073463368525171887413443108399252073413799346454464448297239,
    1154787450473232990877007307548392072878001948725547466967243997065670930781,
    127044796229026925925676336941612140641682969690926841605253822315415053191,
    2264291370407632332462551969004321602019453100516039364350823369215509801549,
    72379171556238964432087169600744290083969196399083027049770867539276234964,
    3392988301432672676654143254540743340205316729651753579425056524920715568596,
    345623899732466539114181911245544957171813978741334524852816912705261753883,
    3185268477836746232513995247235360610631152596074905508986422324167448586405,
    313124898330376979112325153168491303237931126195199786681888350478318132082,
    3252710104456412601428779891144119168067847513403787243699057366054350147707,
    2811893809428838290900969955841763465542245498752761173309728642815514980559,
    1345201406880623537768056884941378708623964668432682170554896434038851699412,
    3445703045232519210994161617357948974635263965405559512355593725498899233769,
]

SP_POLY2 = [2342, 543543, 3, 325, 0, 235325325, 765568568] + [0] * 9
SP_EVAL2 = [
    3342128707467438650582796293028326366188841359173385550320192593983949514781,
    145415729351446532104221590506099754017149096611578597467764922845836744024,
    28344076774352150081365919378257754937378686670188713656703512828535506046,
    102614275072893880928938980182386230479738072876443838528431026477550264998,
    3033695382336505385241782670919441783483213948688819507086473908690567613286,
    939956913328774515564849172117096646347233743420544100796619190984456389268,
    1637409282267998787972433807386232485827432500117030096420080018113277841431,
    1625943999398983738615579915767369295588334238436799695643010994483442206345,
    3594911410986703872812844193278353776989462412403241940436425945741340009951,
    75507220001790948222892434565881002017963472150232301947099166071873513613,
    1219346410107661887858150731282067078930201967594791163094249908344089354239,
    2347240536236105718500758207063838353308586578514927994468409092114441172527,
    3374920525187094988736089450950872833267621485172465575429173175774334119406,
    1711209537345756975647900555311037454790763165006988461096559542358841336444,
    1505297521723099557839333110912200164930605895060277511805849845124000458838,
    645577993076310905171322449016029758257223885423461851614601549014568135642,
]


def test_stark_crt_golden():
    assert SP.crt(SP_POLY1) == SP_EVAL1
    assert SP.crt(SP_POLY2) == SP_EVAL2


def test_stark_icrt_golden():
    assert SP.icrt(SP_EVAL1) == SP_POLY1
    assert SP.icrt(SP_EVAL2) == SP_POLY2


# ---------------------------------------------------------------------------
# babybear golden vector (icrt, babybear/ntt.rs:867-1019)
# ---------------------------------------------------------------------------

BB_RAW = [
    1900625136, 112939065, 80310056, 1982426205, 1861467068, 49211297,
    1445971202, 1729640160, 1963708676, 954083992, 829076309, 438872109,
    1993465853, 308690395, 488768419, 1901524572, 1034036719, 1241375270,
    466225138, 140725638, 1386731196, 1170787115, 837660087, 416513957,
    1889201657, 894740305, 1840816808, 1326838466, 1166698972, 712318050,
    921000781, 1023319258, 1379077144, 501336344, 1221812213, 128415714,
    1320317132, 289989777, 323829215, 1532388335, 672024586, 1004795423,
    801782387, 630843091, 152043073, 1168499229, 261644413, 202256778,
    1733651679, 802644602, 1547582674, 1544500919, 58827862, 1357070166,
    1162233649, 1001050512, 752258130, 97056798, 87706193, 1894023776,
    1292875010, 929142525, 1478368962, 1981103952, 1045062179, 1425840265,
    2027265, 1194516240, 1379980743, 1206462311, 1498258989, 1811570669,
]

BB_COEFFS = [
    1065674974, 1170569399, 170751506, 265022980, 1945207175, 458345263,
    2011655826, 1046550861, 264795716, 1804913559, 843380477, 1398172716,
    851789181, 1613109865, 702106862, 341684672, 1577614606, 307655228,
    1421181641, 742137641, 923616603, 934523206, 1207266670, 487352988,
    958533374, 997570189, 746375437, 449713270, 1293462949, 1967479755,
    1128550923, 78875160, 557134787, 489984819, 1473627119, 1357428011,
    1445264686, 380607359, 1492417418, 318205607, 1329808119, 619981352,
    1642500830, 1919489665, 957117942, 1002845364, 1844882309, 153270753,
    1840769424, 1401353601, 1250603351, 20939975, 424643571, 1025939175,
    1129236551, 494827957, 559340745, 1220615690, 96579813, 1879163772,
    1730330419, 1082601059, 949990547, 129594047, 940074644, 1825399223,
    476133872, 1734778779, 1594364605, 1725670109, 581029317, 1343349559,
]


def test_babybear_icrt_golden():
    assert BB.icrt(_homogenized(BB, BB_RAW)) == BB_COEFFS


def test_babybear_crt_golden_roundtrip():
    # the inverse direction of the hardcoded vector
    assert BB.crt_raw(BB_COEFFS) == BB_RAW


# ---------------------------------------------------------------------------
# structural/oracle tests (reference test categories 2-4, SURVEY.md §4)
# ---------------------------------------------------------------------------


def _slot_remainder(model, coeffs, power):
    """f mod (X^E - root^power), by folding X^E = root^power."""
    q, E = model.q, model.E
    s = pow(model.root, power, q)
    rem = [0] * E
    for i, c in enumerate(coeffs):
        rem[i % E] = (rem[i % E] + c * pow(s, i // E, q)) % q
    return rem


def test_crt_raw_matches_remainders():
    rng = random.Random(0)
    for m in MODELS.values():
        coeffs = [rng.randrange(m.q) for _ in range(m.D)]
        raw = m.crt_raw(coeffs)
        for sidx, p in enumerate(m.slot_powers):
            expected = _slot_remainder(m, coeffs, p)
            assert raw[sidx * m.E:(sidx + 1) * m.E] == expected, (m.name, sidx)


def test_crt_icrt_roundtrip():
    rng = random.Random(1)
    for m in MODELS.values():
        for _ in range(20):
            coeffs = [rng.randrange(m.q) for _ in range(m.D)]
            assert m.icrt(m.crt(coeffs)) == coeffs, m.name


def test_mul_crt():
    """NTT-form slotwise mul == coefficient-form schoolbook mul
    (test_mul_crt, goldilocks/mod.rs:232-247 and per-model twins)."""
    rng = random.Random(2)
    for m in MODELS.values():
        a = [rng.randrange(m.q) for _ in range(m.D)]
        b = [rng.randrange(m.q) for _ in range(m.D)]
        lhs = m.icrt(m.ntt_mul(m.crt(a), m.crt(b)))
        rhs = m.coeff_mul(a, b)
        assert lhs == rhs, m.name


def test_crt_one():
    for m in MODELS.values():
        one = [1] + [0] * (m.D - 1)
        ntt_one = m.crt(one)
        # from_scalar broadcasts over slots (ntt_form.rs:689-692)
        expected = []
        for _ in range(m.N):
            expected.extend(m.ext_from_scalar(1))
        assert ntt_one == expected, m.name


def test_rot_is_mul_by_x():
    rng = random.Random(3)
    for m in MODELS.values():
        a = [rng.randrange(m.q) for _ in range(m.D)]
        x = [0, 1] + [0] * (m.D - 2)
        assert m.rot(a) == m.coeff_mul(a, x), m.name


def test_reduce_degenerate_lengths():
    # From<Vec> pads short vectors / reduces long ones (coeff_form.rs:568-578)
    for m in MODELS.values():
        short = m.reduce([5])
        assert short == [5] + [0] * (m.D - 1)
        # X^D reduces to X^(D/2) - 1 or -1
        xd = [0] * m.D + [1]
        red = m.reduce(xd)
        if m.has_middle_term:
            expected = [(m.q - 1) % m.q] + [0] * (m.D // 2 - 1) + [1] + [0] * (m.D // 2 - 1)
        else:
            expected = [m.q - 1] + [0] * (m.D - 1)
        assert red == expected, m.name
