"""Property tests (hypothesis) for the host-side layout machinery.

These pin the vectorized implementations against naive per-block
references over randomized inputs — the class of host-side rewrite
(searchsorted cursors, segmented-arange block tables, cumsum folds)
where an off-by-one survives example-based tests.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from termdaw_tpu.graph import bake as B


def _naive_block_table(starts, ends, t0, nb, bl, p_cap, steal):
    """Reference semantics of bake.block_table, one block at a time."""
    per_block: list[list[int]] = []
    for k in range(nb):
        b0 = t0 + k * bl
        b1 = b0 + bl
        live = [
            i for i in range(len(starts))
            if starts[i] < b1 and ends[i] > b0
        ]
        per_block.append(live)  # trigger order == index order
    pmax = max((len(x) for x in per_block), default=0)
    if p_cap is not None and pmax > p_cap and steal:
        per_block = [x[-p_cap:] for x in per_block]  # keep the NEWEST
        pmax = p_cap
    if p_cap is not None and pmax <= p_cap:
        p = p_cap
    else:
        p = 1
        while p < max(pmax, 1):
            p *= 2
    idx = np.full((nb, p), -1, np.int32)
    for k, live in enumerate(per_block):
        idx[k, : len(live)] = live
    return idx


spans = st.lists(
    st.tuples(
        st.integers(min_value=-64, max_value=512),   # start
        st.integers(min_value=1, max_value=300),     # duration
    ),
    min_size=0, max_size=24,
)


class TestBlockTableProperty:
    @settings(max_examples=200, deadline=None)
    @given(
        spans,
        st.integers(min_value=0, max_value=128),  # t0
        st.integers(min_value=1, max_value=8),    # nb
        st.sampled_from([16, 32]),                # bl
        st.sampled_from([None, 1, 2, 4, 8]),      # p_cap
        st.booleans(),                            # steal
    )
    def test_matches_naive(self, sp, t0, nb, bl, p_cap, steal):
        starts = np.asarray([s for s, _ in sp], np.int64)
        ends = np.asarray([s + d for s, d in sp], np.int64)
        got = B.block_table(starts, ends, t0, nb, bl, p_cap, steal)
        want = _naive_block_table(starts, ends, t0, nb, bl, p_cap, steal)
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_array_equal(got, want)


class TestClockFoldProperty:
    @settings(max_examples=50, deadline=None)
    @given(
        st.floats(min_value=-10.0, max_value=1000.0, allow_nan=False,
                  allow_subnormal=False, width=32),
        st.integers(min_value=1, max_value=3000),
        st.floats(min_value=0.0009765625, max_value=1.0, allow_nan=False,
                  allow_subnormal=False, width=32),
    )
    def test_fold_is_sequential_f32(self, start, n, delta):
        got = B.clock_fold(np.float32(start), n, np.float32(delta))
        t = np.float32(start)
        for j in range(n):
            assert got[j] == t
            t = np.float32(t + np.float32(delta))
