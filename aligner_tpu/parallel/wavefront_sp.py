"""Cross-chip sequence-parallel wavefront for one huge global pair.

SURVEY.md §5/§7a: the reference's answer to long sequences is the
windowed scan; for a *single* huge pairwise problem the TPU-native
equivalent is anti-diagonal tiling of the DP matrix across chips with
halo exchange of the tile boundary over ICI.  Global mode makes this
exact (penalty ≡ ext after cell (1,1), see ops/wavefront.py), and the
row-scan formulation makes the halo tiny: the only coupling between a
column block and its right neighbor is the block's **last-column H
values** — the max-prefix carry is already folded into them.

Layout: the query (columns) is sharded over the mesh's ``data`` axis;
the target (rows) is walked in blocks of ``tr`` rows, software-pipelined
so device d processes row-block ``k - d`` at pipeline step k while its
right neighbor works one block behind.  After each step the (tr,)
right-boundary vector hops one device over ICI (``lax.ppermute``).
With J row blocks the pipeline runs J + n - 1 steps: efficiency
J/(J+n-1) → 1 for long targets.

The block fill is plain lax (gather + ``lax.cummax``) — the portable
exactness path, bit-identical to the float64 oracle for integral
matrices via int32 arithmetic.  The single-chip Pallas kernel
(ops/wavefront.py) remains the per-device speed path; swapping it into
the block body is a local change because the pipeline only sees
(prev_row, boundary) -> (new_row, boundary).

Scores-only: returns H[tlen, qlen] (the global end score).  Cites:
simple/mod.rs:42-144 (fill + borders), engine/calc.rs thread fan-out
(what this replaces at single-problem scale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG = jnp.int32(-(2**30) // 2)


def _cdiv(a, b):
    return -(-a // b)


def sharded_global_end_score(
    mesh: Mesh,
    q: np.ndarray,
    t: np.ndarray,
    matrix: np.ndarray,
    del_: float,
    ext: float,
    *,
    tr: int = 128,
    axis: str | None = None,
    engine: str | None = None,
    interpret: bool | None = None,
) -> float:
    """Exact global end score H[tlen, qlen] of one pair, columns sharded
    over the mesh axis.  Requires an integral matrix and penalties
    (int32 arithmetic — bit-exact vs the oracle).

    ``engine``: "pallas" runs each device's row-block through the
    column-sharded wavefront kernel (ops/wavefront.run_block_cs — the
    per-device speed path); "lax" uses the portable gather+cummax block
    fill.  Default: pallas on TPU, lax elsewhere.
    """
    from ..backend import on_tpu as _on_tpu

    axis = axis or mesh.axis_names[0]
    n = mesh.shape[axis]
    if engine is None:
        engine = "pallas" if _on_tpu() else "lax"
    if engine == "pallas" and np.abs(np.round(np.asarray(matrix))).max(initial=0) > 127:
        # the packed-byte score words need int8 entries; the lax block
        # fill handles any integral matrix exactly
        engine = "lax"
    if interpret is None:
        interpret = not _on_tpu()
    q = np.asarray(q, np.int32)
    t = np.asarray(t, np.int32)
    matrix = np.asarray(matrix)
    if not (
        np.all(matrix == np.round(matrix))
        and float(del_) == int(del_)
        and float(ext) == int(ext)
    ):
        raise ValueError("sharded wavefront requires integral matrix/penalties")
    V = matrix.shape[0]
    C_real, R_real = len(q), len(t)
    if engine == "pallas":
        # lane-aligned column blocks so each device holds (S_loc, 128)
        Cb = _cdiv(_cdiv(C_real, n), 128) * 128
    else:
        Cb = _cdiv(C_real, n)
    S_loc = max(Cb // 128, 1) if engine == "pallas" else None
    C_pad = Cb * n
    qp = np.full(C_pad, V, np.int32)
    qp[:C_real] = q
    J = _cdiv(R_real, tr)
    R_pad = J * tr
    tp = np.zeros(R_pad, np.int32)
    tp[:R_real] = t
    mi = jnp.asarray(np.round(matrix).astype(np.int32))
    if engine == "pallas":
        from ..ops.wavefront import pack_matrix_words

        mi = jnp.asarray(pack_matrix_words(matrix))
    DEL = np.int32(int(del_))
    EXT = np.int32(int(ext))

    in_specs = (P(axis), P(), P())
    out_specs = P()

    @jax.jit  # one compiled program per device; an eager shard_map
    # dispatches op-by-op (catastrophic through a remote tunnel)
    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def run(q_local, t_full, mat):
        d = lax.axis_index(axis)
        x0 = d * Cb  # global 0-based index of this device's first column
        xg = x0 + jnp.arange(Cb, dtype=jnp.int32)  # global x-1 per lane

        def border(y):
            # H[y, 0] = -y*del with the far-corner overwrite
            # (simple/mod.rs:59-70)
            return jnp.where(
                y == R_real, -(jnp.int32(R_real) + 1) * DEL, -y * DEL
            )

        # H[0, x] for local columns (global border row)
        x1 = xg + 1
        h0 = jnp.where(x1 == C_real, -(jnp.int32(C_real) + 1) * DEL, -x1 * DEL)
        xp = x1 * EXT
        if engine == "pallas":
            from ..ops.wavefront import pack_query_words

            # per-query score table: once per device, reused every step
            pw = pack_query_words(q_local.reshape(S_loc, 128), mat, V)

        def row_fill(carry, inputs):
            prev, end = carry
            ty, bl_prev, bl_cur, y = inputs
            srow = mat[ty][jnp.clip(q_local, 0, V - 1)]
            srow = jnp.where(q_local >= V, NEG, srow)  # padded columns
            diag = jnp.concatenate([bl_prev[None], prev[:-1]]) + srow
            m0 = jnp.maximum(diag, prev - EXT)
            # left-boundary fold; cell (1,1) (device 0, row 1) takes del
            is11 = (y == 1) & (d == 0)
            pen1 = jnp.where(is11, DEL, EXT)
            a0 = jnp.where(
                is11,
                jnp.maximum(diag[0], prev[0] - DEL),
                m0[0],
            )
            a0 = jnp.maximum(a0, bl_cur - pen1)
            a = m0.at[0].set(a0)
            h = lax.cummax(a + xp) - xp
            # capture the end cell when this device owns column C_real
            c_local = jnp.int32(C_real - 1) - x0
            owns = (c_local >= 0) & (c_local < Cb) & (y == R_real)
            val = lax.dynamic_slice(h, (jnp.clip(c_local, 0, Cb - 1),), (1,))[0]
            end = jnp.where(owns, val, end)
            return (h, end), h[-1]

        def pipe_step(k, state):
            prev, end, bound_in, last_bound = state
            j = k - d  # this device's row block this step
            active = (j >= 0) & (j < J)
            jc = jnp.clip(j, 0, J - 1)
            t_rows = lax.dynamic_slice(t_full, (jc * tr,), (tr,))
            ys = jc * tr + 1 + jnp.arange(tr, dtype=jnp.int32)
            # left boundaries per row: device 0 uses the global border,
            # others the vector received from the left neighbor; the
            # first row's diagonal needs the previous block's last
            # boundary (carried in last_bound)
            borders = border(ys)
            bl_cur = jnp.where(d == 0, borders, bound_in)
            if engine == "pallas":
                from ..ops.wavefront import run_block_cs

                lb = jnp.concatenate([last_bound[None], bl_cur])
                scal = jnp.stack([x0, jc * tr]).reshape(1, 2)
                h_new, rights2d, endv = run_block_cs(
                    pw,
                    t_rows.reshape(1, tr),
                    prev.reshape(S_loc, 128), lb.reshape(1, tr + 1),
                    scal,
                    S=S_loc, TR=tr, V=V, C_real=C_real, R_real=R_real,
                    del_=int(DEL), ext=int(EXT), interpret=bool(interpret),
                )
                # block ownership of the end cell (end value may be 0)
                c_loc = jnp.int32(C_real - 1) - x0
                owns = (
                    active
                    & (c_loc >= 0) & (c_loc < Cb)
                    & (jc * tr < R_real) & (R_real <= (jc + 1) * tr)
                )
                new_prev = h_new.reshape(Cb)
                new_end = jnp.where(owns, endv[0, 0], end)
                rights = rights2d[0]
            else:
                bl_prev = jnp.concatenate([last_bound[None], bl_cur[:-1]])
                (new_prev, new_end), rights = lax.scan(
                    row_fill, (prev, end), (t_rows, bl_prev, bl_cur, ys)
                )
            prev = jnp.where(active, new_prev, prev)
            end = jnp.where(active, new_end, end)
            rights = jnp.where(active, rights, jnp.zeros_like(rights))
            new_last = jnp.where(active, bl_cur[-1], last_bound)
            # ship this block's right boundary one device over ICI
            bound_next = lax.ppermute(
                rights, axis, [(i, (i + 1) % n) for i in range(n)]
            )
            return (prev, end, bound_next, new_last)

        # seed last_bound with H[0, x0] (1-based column x0 = this
        # device's left-neighbor column) — a border-ROW value, closed
        # form for every device: -(x0)*del with the far-corner overwrite
        lb0 = jnp.where(
            x0 == C_real, -(jnp.int32(C_real) + 1) * DEL, -x0 * DEL
        )
        init = (
            h0,
            jnp.int32(NEG),
            jnp.zeros(tr, jnp.int32),
            lb0,
        )
        prev, end, _, _ = lax.fori_loop(0, J + n - 1, pipe_step, init)
        del prev
        return jax.lax.psum(jnp.where(end == NEG, 0, end), axis)

    out = run(jnp.asarray(qp), jnp.asarray(tp), mi)
    return float(np.asarray(out))
