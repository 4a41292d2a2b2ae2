import numpy as np


def test_greedy_match_agrees_with_lsa_on_separable_costs():
    """The device greedy matcher (axon fallback — no host callbacks there)
    matches scipy LSA exactly on well-separated costs and is a valid
    assignment (unique queries) on random ones."""
    import jax.numpy as jnp
    from scipy.optimize import linear_sum_assignment

    from spectrogram_yolov11_tpu.ops.detr_loss import _greedy_match

    rng = np.random.default_rng(0)
    b, nq, g = 2, 12, 5
    # well-separated: one clear best query per gt
    cost = rng.uniform(5, 10, (b, nq, g)).astype(np.float32)
    best_q = rng.permutation(nq)[:g]
    for bi in range(b):
        for gi, q in enumerate(best_q):
            cost[bi, q, gi] = gi * 0.01
    mask = np.ones((b, g), bool)
    rows = np.asarray(_greedy_match(jnp.asarray(cost), jnp.asarray(mask)))
    for bi in range(b):
        r, c = linear_sum_assignment(cost[bi])
        lsa = np.zeros(g, np.int64)
        lsa[c] = r
        np.testing.assert_array_equal(rows[bi], lsa)

    # random costs: result must still be a valid one-to-one assignment
    cost = rng.normal(size=(b, nq, g)).astype(np.float32)
    mask = np.ones((b, g), bool)
    mask[1, 3:] = False  # padded gt slots
    rows = np.asarray(_greedy_match(jnp.asarray(cost), jnp.asarray(mask)))
    assert len(set(rows[0].tolist())) == g  # unique queries per valid gt
    assert len(set(rows[1, :3].tolist())) == 3
