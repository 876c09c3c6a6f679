"""On-TPU Pallas kernel verification: Mosaic-path numerics vs XLA.

The test suite runs the kernels in CPU interpret mode (tests/conftest.py),
which checks the kernel MATH but not the Mosaic compilation path — layout,
sublane, and revisit-ordering bugs only show up on the real chip. This
script runs every Pallas kernel (forward AND gradients) on the default
device and compares against the XLA segment-op composition.

Usage:  python scripts/tpu_check.py          (exit 0 = all pass)

Checks, each at parity (exact=True) and throughput (exact=False) settings:
  - spmm fwd/bwd              vs gather_segment_sum
  - spmm_weighted fwd/d_x/d_w vs weighted gather_segment_sum / SDDMM oracle
  - sddmm fwd/d_x/d_y         vs per-edge dot oracle
  - attention_propagate       vs XLA segment-softmax composition
  - out-of-core sliced spmm   vs the unsliced kernel
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sagnn_tpu.ops.segment import gather_segment_sum  # noqa: E402
from sagnn_tpu.ops.spmm_pallas import (  # noqa: E402
    plan_spmm, spmm_from_plans, spmm_weighted_from_plans, sddmm_from_plans,
    spmm_apply, _plan_args_tracked)

NU, NI, E, D = 1000, 700, 20_000, 64
# bf16 checks compare against a bf16-cast oracle (inputs rounded to bf16
# exactly as the kernels do; MXU bf16 products accumulate exactly in f32),
# so BOTH settings get tight tolerances — only summation order differs.
TOL = {True: 2e-5, False: 2e-5}
failures = []


def b16(a):
    """Round to bf16 and back — the kernels' input quantization."""
    return a.astype(jnp.bfloat16).astype(jnp.float32)


def check(name: str, got, want, tol: float):
    got, want = np.asarray(got), np.asarray(want)
    err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'}  {name}: max rel err {err:.2e} "
          f"(tol {tol:.0e})")
    if not ok:
        failures.append(name)


def main() -> int:
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(7)
    # bipartite edges, u-direction sorted by user, i-direction by item
    users = rng.integers(0, NU, E, dtype=np.int32)
    items = rng.integers(0, NI, E, dtype=np.int32)
    o = np.argsort(users, kind="stable")
    u_src, u_tgt = items[o], users[o]
    oi = np.argsort(items, kind="stable")
    i_src, i_tgt = users[oi], items[oi]
    # canonical edge order = u-direction; i-direction edge e is u-edge
    # perm[e]:  u-order position of each i-order edge
    u_pos = np.empty(E, np.int64)
    u_pos[o] = np.arange(E)
    perm = u_pos[oi].astype(np.int32)

    fwd = plan_spmm(u_src, u_tgt, NU, track_edges=True)
    bwd = plan_spmm(i_src, i_tgt, NI, edge_ids=perm)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (NI, D), jnp.float32)       # item table
    y = jax.random.normal(jax.random.PRNGKey(1), (NU, D), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (E,), jnp.float32)
    g_out = jax.random.normal(jax.random.PRNGKey(3), (NU, D), jnp.float32)
    g_edge = jax.random.normal(jax.random.PRNGKey(4), (E,), jnp.float32)
    us, ut = jnp.asarray(u_src), jnp.asarray(u_tgt)

    # ---- unweighted spmm ---------------------------------------------------
    for exact in (True, False):
        tag = "exact" if exact else "bf16"
        q = (lambda a: a) if exact else b16
        out = jax.jit(lambda x, e=exact: spmm_from_plans(x, fwd, bwd, e))(x)
        check(f"spmm fwd [{tag}]", out,
              gather_segment_sum(q(x), us, ut, NU), TOL[exact])
        # bwd: d/dx <g_out, A x> = A^T g_out
        dx = jax.jit(jax.grad(
            lambda x, e=exact: jnp.vdot(spmm_from_plans(x, fwd, bwd, e),
                                        g_out)))(x)
        dx_ref = jax.ops.segment_sum(jnp.take(q(g_out), ut, 0), us,
                                     num_segments=NI)
        check(f"spmm bwd [{tag}]", dx, dx_ref, TOL[exact])

    # ---- row-folded unweighted spmm (exact-mode memory lever) --------------
    # Mosaic must handle the [C, 2D] message tile + in-kernel parity mux +
    # 64-lane static slices — CPU interpret mode cannot catch layout bugs
    from sagnn_tpu.ops.spmm_pallas import _plan_args, spmm
    *fa_, fnb_, fnt_ = _plan_args(fwd)
    *ba_, bnb_, bnt_ = _plan_args(bwd)
    fa_, ba_ = tuple(fa_), tuple(ba_)
    for exact in (True, False):
        tag = "folded" if exact else "folded bf16"
        q = (lambda a: a) if exact else b16
        out = jax.jit(lambda x, e=exact: spmm(
            x, fa_, ba_, fnb_, fnt_, bnb_, bnt_, e, True))(x)
        check(f"spmm fwd [{tag}]", out,
              gather_segment_sum(q(x), us, ut, NU), TOL[exact])
        dxf = jax.jit(jax.grad(
            lambda x, e=exact: jnp.vdot(spmm(
                x, fa_, ba_, fnb_, fnt_, bnb_, bnt_, e, True), g_out)))(x)
        check(f"spmm bwd [{tag}]", dxf,
              jax.ops.segment_sum(jnp.take(q(g_out), ut, 0), us,
                                  num_segments=NI), TOL[exact])

    # ---- weighted spmm -----------------------------------------------------
    for exact in (True, False):
        tag = "exact" if exact else "bf16"
        q = (lambda a: a) if exact else b16
        out = jax.jit(lambda x, w, e=exact: spmm_weighted_from_plans(
            x, w, fwd, bwd, e))(x, w)
        # weights ride the one-hot operand, so bf16 mode rounds them too
        check(f"spmm_weighted fwd [{tag}]", out,
              gather_segment_sum(q(x), us, ut, NU, weights=q(w)), TOL[exact])
        dx, dw = jax.jit(jax.grad(
            lambda x, w, e=exact: jnp.vdot(
                spmm_weighted_from_plans(x, w, fwd, bwd, e), g_out),
            argnums=(0, 1)))(x, w)
        dx_ref = jax.ops.segment_sum(
            jnp.take(q(g_out), ut, 0) * q(w)[:, None], us, num_segments=NI)
        dw_ref = jnp.sum(jnp.take(q(x), us, 0) * jnp.take(q(g_out), ut, 0),
                         -1)
        check(f"spmm_weighted d_x [{tag}]", dx, dx_ref, TOL[exact])
        check(f"spmm_weighted d_w [{tag}]", dw, dw_ref, TOL[exact])

    # ---- sddmm -------------------------------------------------------------
    for exact in (True, False):
        tag = "exact" if exact else "bf16"
        q = (lambda a: a) if exact else b16
        out = jax.jit(lambda x, y, e=exact: sddmm_from_plans(
            x, y, fwd, bwd, e))(x, y)
        sref = jnp.sum(jnp.take(q(x), us, 0) * jnp.take(q(y), ut, 0), -1)
        check(f"sddmm fwd [{tag}]", out, sref, TOL[exact])
        dx, dy = jax.jit(jax.grad(
            lambda x, y, e=exact: jnp.vdot(
                sddmm_from_plans(x, y, fwd, bwd, e), g_edge),
            argnums=(0, 1)))(x, y)
        # sddmm's bwd runs weighted SpMMs with the edge cotangent riding the
        # one-hot, so bf16 mode rounds g_edge as well
        dx_ref = jax.ops.segment_sum(
            jnp.take(q(y), ut, 0) * q(g_edge)[:, None], us, num_segments=NI)
        dy_ref = jax.ops.segment_sum(
            jnp.take(q(x), us, 0) * q(g_edge)[:, None], ut, num_segments=NU)
        check(f"sddmm d_x [{tag}]", dx, dx_ref, TOL[exact])
        check(f"sddmm d_y [{tag}]", dy, dy_ref, TOL[exact])

    # ---- attention propagation (SDDMM -> edge softmax -> weighted) --------
    from sagnn_tpu.ops.edge_attention import attention_propagate
    fa, fnb, fnt = _plan_args_tracked(fwd)
    ba, bnb, bnt = _plan_args_tracked(bwd)
    mask = jnp.ones((E,), jnp.float32)
    att = jax.jit(lambda x, y: attention_propagate(
        x, y, ut, fa, ba, fnb, fnt, bnb, bnt, mask=mask, exact=True))(x, y)
    s = jnp.sum(jnp.take(x, us, 0) * jnp.take(y, ut, 0), -1) \
        / jnp.sqrt(float(D))
    mx = jax.ops.segment_max(s, ut, num_segments=NU + 1)
    z = jnp.exp(s - jnp.take(jnp.where(jnp.isfinite(mx), mx, 0.0), ut))
    den = jax.ops.segment_sum(z, ut, num_segments=NU + 1)
    aw = z / jnp.maximum(jnp.take(den, ut), 1e-9)
    att_ref = gather_segment_sum(x, us, ut, NU, weights=aw)
    check("attention_propagate fwd [exact]", att, att_ref, 1e-4)
    da = jax.jit(jax.grad(lambda x, y: jnp.vdot(attention_propagate(
        x, y, ut, fa, ba, fnb, fnt, bnb, bnt, mask=mask, exact=True),
        g_out)))(x, y)
    da_ref = jax.grad(lambda x, y: jnp.vdot(gather_segment_sum(
        x, us, ut, NU,
        weights=(lambda s: (lambda z: z / jnp.maximum(jnp.take(
            jax.ops.segment_sum(z, ut, num_segments=NU + 1), ut), 1e-9))(
            jnp.exp(s - jnp.take(jnp.where(jnp.isfinite(jax.ops.segment_max(
                s, ut, num_segments=NU + 1)), jax.ops.segment_max(
                    s, ut, num_segments=NU + 1), 0.0), ut))))(
            jnp.sum(jnp.take(x, us, 0) * jnp.take(y, ut, 0), -1)
            / jnp.sqrt(float(D)))), g_out))(x, y)
    check("attention_propagate d_x [exact]", da, da_ref, 1e-4)

    # ---- out-of-core sliced spmm -------------------------------------------
    fwd_sl = plan_spmm(u_src, u_tgt, NU, num_slices=4,
                       num_chunks=fwd.num_chunks + 8)
    out_sl = jax.jit(lambda x: spmm_apply(
        x, jnp.asarray(fwd_sl.src), jnp.asarray(fwd_sl.tgt_local),
        jnp.asarray(fwd_sl.chunk_block), jnp.asarray(fwd_sl.chunk_first),
        fwd_sl.num_blocks, fwd_sl.num_tgt, exact=True, num_slices=4))(x)
    check("spmm sliced (4) [exact]", out_sl,
          gather_segment_sum(x, us, ut, NU), TOL[True])

    print(f"\n{len(failures)} failure(s)" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
