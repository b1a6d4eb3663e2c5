"""Round-11 operator tests: Kulldorff MC hash dispersion at R=99,
nowcast-composed outbreak detection, MySQL misc built-ins round 2,
polygon metrics, WKB round-trip, IVF-PQ multi-probe recall."""
import datetime as dt
import math
import os
import statistics

import pytest


# ---------------------------------------------------------------------------
# Kulldorff Monte-Carlo case hash: multinomial dispersion (the ADVICE r10
# high item — the affine stride this replaced is a low-discrepancy lattice)
# ---------------------------------------------------------------------------


def _mix(x, M31, MIX2, MIX3):
    h = (x % M31) * 48271 % M31
    h = h ^ (h >> 15)
    h = h * MIX2 % M31
    h = h ^ (h >> 13)
    h = h * MIX3 % 4294967296
    return h ^ (h >> 16)


def test_kulldorff_mix_hash_dispersed_vs_affine_stride():
    """The Kulldorff replicate draw pos = 1 + mix(i*(R+1)+j) % n must
    disperse like a TRUE multinomial: with C cases over n equal cells,
    per-cell counts have sd ~ sqrt(C/n * (1 - 1/n)). The affine stride
    ((i*R + j)*KNUTH) % 2^32 % n it replaced is systematic sampling —
    its per-cell counts hug C/n within ~1, shrinking the null max-LLR
    distribution and making p anti-conservative. Both halves asserted:
    the shipped mix is multinomial-wide AND the rejected stride is
    provably narrow on the same draw."""
    from sdp_spark.operators.stats import (
        _KULL_REPS,
        _ST_M31,
        _ST_MIX2,
        _ST_MIX3,
    )
    from sdp_spark.functions.num import KNUTH, KNUTH_MOD

    n, c = 96, 15000  # cells / cases, the sf0.1-ish fixture shape
    sd_theory = math.sqrt(c / n * (1 - 1 / n))  # ~12.4

    sds_mix, sds_aff = [], []
    for j in range(1, 6):  # five replicates, each judged alone
        cnt_mix, cnt_aff = [0] * n, [0] * n
        for i in range(1, c + 1):
            cnt_mix[_mix(i * (_KULL_REPS + 1) + j, _ST_M31, _ST_MIX2, _ST_MIX3) % n] += 1
            cnt_aff[((i * _KULL_REPS + j) * KNUTH) % KNUTH_MOD % n] += 1
        sds_mix.append(statistics.pstdev(cnt_mix))
        sds_aff.append(statistics.pstdev(cnt_aff))

    # shipped mix: every replicate within [0.6, 1.5] x multinomial sd
    for sd in sds_mix:
        assert 0.6 * sd_theory < sd < 1.5 * sd_theory, (sd, sd_theory)
    # rejected affine stride: systematically under-dispersed (< 0.25x)
    assert max(sds_aff) < 0.25 * sd_theory, (sds_aff, sd_theory)


def test_kulldorff_null_p_values_not_anticonservative(spark, tmp_path):
    """On NULL data (a uniform grid, no planted cluster) the scan must
    not report significance: every returned zone's p must be well above
    the 1/(R+1) floor. Under the affine stride this failed — near-null
    zones reported p at the floor because no replicate max ever reached
    even modest observed LLRs."""
    import pandas as pd

    from sdp_spark.operators.stats import (
        _KULL_REPS,
        query_spatial_scan_kulldorff,
    )
    from tests.test_round10_ops import _cell_id_pools

    pools = _cell_id_pools()
    cells = sorted(pools.keys())[:40]
    keys = []
    for cell in cells:  # 2 customers per cell: flat, clusterless
        keys.extend(pools[cell][:2])
    sf = str(tmp_path / "kullnull")
    os.makedirs(sf)
    pd.DataFrame({"c_custkey": keys}).to_parquet(f"{sf}/customer.parquet")
    out = query_spatial_scan_kulldorff(spark, sf).collect()
    assert len(out) > 0
    floor = 1 / (_KULL_REPS + 1)
    for r in out:
        assert r.p_value >= 10 * floor, (r, floor)
