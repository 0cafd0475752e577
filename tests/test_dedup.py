

def test_lsh_detection_prob_and_tune():
    """S-curve math: brute-force simulated detection matches the
    closed form, and the tuner's pick dominates naive configs."""
    import numpy as np

    from pg2kinesis_spark.functions.dedup import lsh_detection_prob, lsh_tune

    rng = np.random.RandomState(5)
    # simulate banding: a band matches iff all r rows agree, each row
    # agrees independently with prob j
    for j, k, bands in [(0.3, 16, 4), (0.7, 16, 4), (0.5, 24, 6)]:
        r = k // bands
        sims = (rng.rand(20000, bands, r) < j).all(axis=2).any(axis=1)
        want = lsh_detection_prob(j, k, bands)
        assert abs(sims.mean() - want) < 0.02
    # monotone in j
    ps = [lsh_detection_prob(j / 10, 16, 4) for j in range(1, 10)]
    assert ps == sorted(ps)
    import pytest

    with pytest.raises(ValueError):
        lsh_detection_prob(0.5, 16, 5)  # bands must divide k

    best = lsh_tune(0.6, max_k=64)
    assert best["k"] % best["bands"] == 0
    # the tuned threshold lands near the target and the curve is high
    # above it, low below it
    assert abs(best["threshold"] - 0.6) < 0.2
    assert lsh_detection_prob(0.8, best["k"], best["bands"]) > 0.9
    assert lsh_detection_prob(0.3, best["k"], best["bands"]) < 0.25
    # the tuner's cost is no worse than the repo's default (16, 4)
    naive = lsh_tune(0.6, max_k=16)
    assert best["cost"] <= naive["cost"] + 1e-12
    # recall-weighted tuning trades threshold DOWN (catches more dups)
    recall = lsh_tune(0.6, max_k=64, fn_weight=10.0)
    assert recall["threshold"] <= best["threshold"] + 1e-9
