"""Unit tests for ops/chunking.py — the shared catalog-chunk policy and
the local-column scatter whose negative-offset wrap hazard bit round 3
(jnp .at[] wraps negative indices numpy-style BEFORE mode='drop')."""

import jax.numpy as jnp
import numpy as np

from sagnn_tpu.ops.chunking import (AUTO_CHUNK_ROWS, DENSE_MAX_ROWS,
                                    auto_chunk_rows, scatter_local_mask)


def test_auto_chunk_policy():
    assert auto_chunk_rows(DENSE_MAX_ROWS) == -1
    assert auto_chunk_rows(DENSE_MAX_ROWS + 1) == AUTO_CHUNK_ROWS
    assert auto_chunk_rows(1) == -1


def test_scatter_local_mask_negative_offsets_do_not_wrap():
    # id 2 with base 10 gives local -8, which numpy-wraps to column
    # width-8 — the exact bug class the helper centralizes
    ids = jnp.asarray([[2, 12, 99]])
    got = np.asarray(scatter_local_mask(ids, 10, 16))
    want = np.zeros((1, 16), bool)
    want[0, 2] = True               # id 12 -> local 2; 2 and 99 dropped
    np.testing.assert_array_equal(got, want)


def test_scatter_local_mask_valid_gate_and_bounds():
    ids = jnp.asarray([[0, 5, 15, 16], [3, 3, 7, 31]])
    valid = jnp.asarray([[1.0, 0.0, 1.0, 1.0], [1.0, 1.0, 0.0, 1.0]])
    got = np.asarray(scatter_local_mask(ids, 0, 16, valid=valid))
    want = np.zeros((2, 16), bool)
    want[0, 0] = True                # 5 gated off; 16 out of range
    want[0, 15] = True
    want[1, 3] = True                # duplicate ids collapse; 7 gated off
    np.testing.assert_array_equal(got, want)


def test_scatter_local_mask_traced_base():
    # base may be a traced scalar (sharded_topk passes axis_index * rows)
    import jax

    def f(base):
        return scatter_local_mask(jnp.asarray([[4, 9]]), base, 4)

    got = np.asarray(jax.jit(f)(jnp.int32(8)))
    want = np.zeros((1, 4), bool)
    want[0, 1] = True                # id 9 -> local 1; id 4 -> local -4
    np.testing.assert_array_equal(got, want)
