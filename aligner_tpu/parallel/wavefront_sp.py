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

Three per-device block engines: "band" (ops/wavefront.run_block_band,
round 4 — the scan-free band-diagonal formulation with a 2-deep
dependence chain, the forward speed path; int8 matrices), "pallas"
(ops/wavefront.run_block_cs, the row-scan formulation — also the
direction-emitting replay engine of the traceback), and "lax"
(portable gather + ``lax.cummax``, any integral matrix, no width cap).
All are bit-identical to the float64 oracle via int32 arithmetic.

Exact alignments (not just end scores): the forward pipeline
additionally records (a) one H-row checkpoint every ``tb_rows`` rows
per device and (b) every left-boundary vector each device consumed —
O(R·n + R·C/tb) ints instead of an O(R·C) plane.  The traceback then
replays one (tb_rows × column-block) tile at a time *with* directions;
the replayed tile is the identical DP restricted to that tile, so the
backward walk follows exactly the directions a full-plane reference
traceback would (no tie-break divergence by construction).  Cites:
simple/mod.rs:42-144 (fill + borders), simple/mod.rs:99-127 (traceback
semantics), engine/calc.rs thread fan-out (what this replaces at
single-problem scale).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

# plain int (NOT a jnp scalar): importing this module must not touch
# the XLA backend — jax.distributed.initialize() may run after import
NEG = -(2**30) // 2

# Per-device VMEM bounds for the pallas block engine.  Forward fill
# (run_block_cs, no dirs) holds ~36 bytes/column resident (packed words
# 24·Cb + three (S,128) i32 tiles); the replay adds a packed direction
# tile of TB/4 bytes/column.  Wider blocks fall back to the lax engine
# (bit-identical, no width cap); narrower TB keeps replays compiling.
MAX_CB = 256 * 1024  # same bound family as ops.wavefront.MAX_WIDTH
_REPLAY_VMEM_BYTES = 10 * 2**20


def _cdiv(a, b):
    return -(-a // b)


# Measured per-device block-engine throughput model (one v5e, round 4 —
# the six calibration points and methodology are in docs/PERF_NOTES.md
# "Round 4" and BENCH_modes.json::wavefront_sp):
#
#   band:     r∞(tr) = 0.94·tr / (68 + 0.24·tr/128) GCUPS  (per-step
#             floor 68 cycles + 0.24 cycles/sublane at ud=32), times
#             the band ramp Cb/(Cb+tr−1);
#   row-scan: ≈ min(48, 0.0012·Cb) GCUPS at tr=128 (per-row floor makes
#             narrow column blocks latency-bound).
#
# Validated within ~8% against measurements at Cb ∈ {2048, 8192, 65536}.
_BAND_FLOOR_CYCLES = 68.0
_BAND_SLOPE_CYCLES_PER_SUBLANE = 0.24
_ROWSCAN_SAT_GCUPS = 48.0
_ROWSCAN_PER_COL_GCUPS = 0.0012


def band_rate_model(tr: int, cb: int) -> float:
    """Modeled band block-engine GCUPS at band height ``tr`` and
    per-device column-block width ``cb`` (ramp included)."""
    r_inf = 0.94 * tr / (
        _BAND_FLOOR_CYCLES + _BAND_SLOPE_CYCLES_PER_SUBLANE * tr / 128.0
    )
    return r_inf * cb / (cb + tr - 1)


def rowscan_rate_model(cb: int) -> float:
    """Modeled row-scan block-engine GCUPS at column width ``cb``."""
    return min(_ROWSCAN_SAT_GCUPS, _ROWSCAN_PER_COL_GCUPS * cb)


def auto_shard_config(
    qlen: int, tlen: int, n: int, *, max_band_tr: int = 16384
) -> tuple[str, int, float]:
    """Pick ``(engine, tr, modeled_gcups_per_chip)`` for the sharded
    pipeline: maximize per-device block rate × the pipeline fill factor
    J/(J+n−1), J = ceil(R/tr).  The (tr, J, n) tension this resolves:
    the band engine wants tall bands (per-step floor amortization) but
    tall bands cut the pipeline step count J and widen the band ramp;
    the row-scan engine runs any tr but collapses on narrow column
    blocks.  ``max_band_tr`` caps the band height (the traceback path
    passes a smaller cap so the direction-replay tile stays within its
    VMEM/HBM budget)."""
    cb = max(_cdiv(_cdiv(qlen, n), 128) * 128, 128)
    r128 = max(_cdiv(tlen, 128) * 128, 128)

    def fill(tr):
        j = _cdiv(tlen, tr)
        return j / (j + n - 1)

    best = ("pallas", 128, rowscan_rate_model(cb) * fill(128))
    tr = 512
    while tr <= min(max_band_tr, r128):
        e = band_rate_model(tr, cb) * fill(tr)
        if e > best[2]:
            best = ("band", tr, e)
        tr *= 2
    return best


def _prep_sharded(mesh, q, t, matrix, del_, ext, tr, axis, engine, interpret,
                  tb_rows=None):
    """Shared operand prep + validation for the sharded entry points.

    ``engine`` ∈ {"pallas" (row-scan block kernel), "band" (band-
    diagonal block kernel, round 4 — scores/boundaries only, so the
    traceback replay uses the row-scan kernel), "lax"}.
    """
    from ..backend import on_tpu as _on_tpu
    from ..ops.wavefront import range_ok

    axis = axis or mesh.axis_names[0]
    n = mesh.shape[axis]
    if len(q) == 0 or len(t) == 0:
        # guard BOTH sharded entries (align re-checks later): a
        # zero-length operand reaches dynamic_slice/reshape with
        # zero-size shapes and fails at trace time with an opaque error
        raise ValueError("empty sequence")
    # validate BEFORE any per-element conversion: rejection of an
    # oversized pair must be O(1), not preceded by a giant int32 copy
    matrix = np.asarray(matrix)
    if not (
        np.all(matrix == np.round(matrix))
        and float(del_) == int(del_)
        and float(ext) == int(ext)
    ):
        raise ValueError("sharded wavefront requires integral matrix/penalties")
    if not range_ok(len(q), len(t), del_, ext):
        raise ValueError(
            "sharded wavefront: scores would exceed the int32-exact range "
            "(see ops.wavefront.range_ok)"
        )
    auto_pick = engine is None and tr is None
    if tr is None:
        tr = 128
    if engine is None:
        engine = "pallas" if _on_tpu() else "lax"
        if auto_pick and _on_tpu():
            # pick (engine, tr) from the measured throughput model; the
            # traceback path caps the band height so the direction-
            # replay tile stays within its VMEM/HBM budget
            engine, tr, _ = auto_shard_config(
                len(q), len(t), n,
                max_band_tr=2048 if tb_rows is not None else 16384,
            )
    if engine in ("pallas", "band") and (
        np.abs(np.round(matrix)).max(initial=0) > 127
    ):
        # the packed-byte score words need int8 entries; the lax block
        # fill handles any integral matrix exactly
        engine = "lax"
    if engine == "pallas" and _cdiv(_cdiv(len(q), n), 128) * 128 > MAX_CB:
        # per-device column block past the VMEM budget of the row-scan
        # pallas block engine (same bound family as
        # ops.wavefront.MAX_WIDTH) — the lax engine streams rows through
        # XLA with no width cap.  (The band engine has no Cb cap: its
        # packed words are over the TB rows, not the Cb columns.)
        engine = "lax"
    if interpret is None:
        interpret = not _on_tpu()
    q = np.asarray(q, np.int32)
    t = np.asarray(t, np.int32)
    V = matrix.shape[0]
    C_real, R_real = len(q), len(t)
    if engine in ("pallas", "band"):
        # lane-aligned column blocks so each device holds (S_loc, 128)
        Cb = _cdiv(_cdiv(C_real, n), 128) * 128
        S_loc = max(Cb // 128, 1)
    else:
        Cb = _cdiv(C_real, n)
        S_loc = None
    if engine == "band":
        # band lanes are rows: tr must be a 128 multiple, and clamping
        # it to the padded target length keeps the hat-coordinate step
        # count within range_ok's slack (and avoids filling pure padding)
        tr = max(128, min(
            _cdiv(tr, 128) * 128, _cdiv(max(R_real, 1), 128) * 128
        ))
    C_pad = Cb * n
    qp = np.full(C_pad, V, np.int32)
    qp[:C_real] = q
    J = _cdiv(R_real, tr)
    stride = n_ck = None
    replay_engine = "pallas" if engine in ("pallas", "band") else "lax"
    if tb_rows is not None:
        if replay_engine == "pallas":
            # bound the replayed direction tile to the VMEM budget:
            # (36 + TB/4)·Cb bytes must fit.  If even TB=tr does not,
            # replay tiles via the lax engine (bit-identical dirs; the
            # forward fill stays pallas) instead of failing Mosaic
            # allocation at exactly chromosome scale (review r3 #3)
            tb_max = (_REPLAY_VMEM_BYTES // Cb - 36) * 4
            tb_max = (tb_max // tr) * tr
            if tb_max >= tr:
                tb_rows = min(tb_rows, tb_max)
            else:
                replay_engine = "lax"
        # checkpoint cadence must divide into whole tr-blocks, and the
        # padded row count into whole checkpoints, so replays are uniform
        stride = max(tb_rows // tr, 1)
        J = _cdiv(J, stride) * stride
        n_ck = J // stride
    R_pad = J * tr
    tp = np.zeros(R_pad, np.int32)
    tp[:R_real] = t
    mat_i32 = jnp.asarray(np.round(matrix).astype(np.int32))
    mi = mat_i32
    mi_replay = None
    lut_bits = bias2 = 0
    if engine == "pallas":
        from ..ops.wavefront import pack_matrix_words

        mi = jnp.asarray(pack_matrix_words(matrix))
    elif engine == "band":
        from ..ops.wavefront import pack_matrix_nibbles, pack_matrix_words

        mrnd = np.round(matrix).astype(np.int64)
        if int(mrnd.max()) - int(mrnd.min()) <= 15:
            pmat, bias = pack_matrix_nibbles(matrix.T)
            lut_bits, bias2 = 4, bias + 2 * int(ext)
        else:
            pmat = pack_matrix_words(matrix.T)
            lut_bits, bias2 = 8, 2 * int(ext) - 128
        mi = jnp.asarray(pmat)
        if tb_rows is not None and replay_engine == "pallas":
            mi_replay = jnp.asarray(pack_matrix_words(matrix))
    return dict(
        axis=axis, n=n, engine=engine, interpret=bool(interpret),
        q=q, t=t, V=V, C_real=C_real, R_real=R_real,
        Cb=Cb, S_loc=S_loc, C_pad=C_pad, qp=qp,
        J=J, R_pad=R_pad, tp=tp, mi=mi, tr=tr,
        DEL=np.int32(int(del_)), EXT=np.int32(int(ext)),
        stride=stride, n_ck=n_ck, replay_engine=replay_engine,
        mat_i32=mat_i32, mi_replay=mi_replay,
        lut_bits=lut_bits, bias2=bias2,
    )


BAND_TD = 512  # SMEM stream chunk length of the band block engine


def _pipeline(mesh, pp, with_trace: bool):
    """Build (cached) + run the jitted shard_map pipeline.  Returns
    ``end`` or ``(end, lb_hist (n, R_pad), ckpts (n_ck, C_pad))``.

    On a multi-controller mesh the trace records are all-gathered inside
    the pipeline (``replicate_trace``) so every process holds the full
    O(R·n + R·C/tb) history — the gather the round-4 limitation was
    missing; the replay/walk then runs process-locally."""
    multiproc = len({d.process_index for d in mesh.devices.flat}) > 1
    run = _build_pipeline(
        mesh, pp["axis"], pp["n"], pp["engine"], pp["interpret"],
        pp["V"], pp["Cb"], pp["S_loc"],
        pp["J"], pp["R_pad"], int(pp["DEL"]), int(pp["EXT"]),
        pp["stride"], pp["n_ck"], pp["tr"], with_trace,
        pp["lut_bits"], pp["bias2"], with_trace and multiproc,
    )
    lens = jnp.asarray([pp["C_real"], pp["R_real"]], jnp.int32)
    if not multiproc:
        return run(jnp.asarray(pp["qp"]), jnp.asarray(pp["tp"]), pp["mi"],
                   lens)
    # multi-controller mesh (the halo ppermute hops cross process
    # boundaries over DCN): every process holds the same full host
    # operands, so each just materializes its own addressable shards
    from jax.sharding import NamedSharding

    def place(a, spec):
        a = np.asarray(a)
        return jax.make_array_from_callback(
            a.shape, NamedSharding(mesh, spec), lambda idx: a[idx]
        )

    return run(
        place(pp["qp"], P(pp["axis"])),
        place(pp["tp"], P()),
        place(pp["mi"], P()),
        place(lens, P()),
    )


@functools.lru_cache(maxsize=64)
def _build_pipeline(mesh, axis, n, engine, interpret, V,
                    Cb, S_loc, J, R_pad, del_i, ext_i, stride, n_ck, tr,
                    with_trace, lut_bits=0, bias2=0, replicate_trace=False):
    """The jitted shard_map program, cached on its static parameters —
    rebuilding the jit wrapper per call would retrace the whole J-step
    pipeline every time (~0.4 s constant overhead per invocation
    measured on the 64k case, vs ~0 warm when cached).  The REAL pair
    lengths ride in as a replicated (2,) operand, so one compiled
    pipeline serves every pair whose padded bucket (Cb, J) matches —
    distinct lengths within a bucket stop costing a fresh ~60 s remote
    compile each (docs/PERF_NOTES.md, compile-bucket lever)."""
    DEL = np.int32(del_i)
    EXT = np.int32(ext_i)

    in_specs = (P(axis), P(), P(), P())
    if with_trace:
        # replicate_trace (multi-controller meshes): all_gather the
        # records inside the pipeline so every process can replay/walk
        # locally; otherwise leave them mesh-sharded (no extra traffic)
        out_specs = (
            (P(), P(), P()) if replicate_trace
            else (P(), P(axis, None), P(None, axis))
        )
    else:
        out_specs = P()

    @jax.jit  # one compiled program per device; an eager shard_map
    # dispatches op-by-op (catastrophic through a remote tunnel)
    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def run(q_local, t_full, mat, lens):
        C_real = lens[0]
        R_real = lens[1]
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
        if engine == "band":
            from ..ops.wavefront import run_block_band

            D_pad = _cdiv(Cb + tr - 1, BAND_TD) * BAND_TD
            n_chunks = D_pad // BAND_TD
            S_band = tr // 128
            dvec = jnp.arange(D_pad, dtype=jnp.int32) + 1  # band step d
            khat = (dvec - 1) * EXT  # the hat offset of stream slot d-1
            # local query-code stream, padded with V past the block
            qs = jnp.concatenate([
                q_local, jnp.full(D_pad - Cb, V, jnp.int32)
            ]).reshape(n_chunks, 1, BAND_TD)
            # top-row stream of block 0 = the global border row (pre-
            # hatted, UNcorrected — the (1,1) del-up correction is
            # applied per block when building the fill stream, so the
            # carried stream stays clean for the fd diag reads)
            xgd = x0 + dvec  # global 1-based column of lane 0 at step d
            prev0 = jnp.where(
                xgd == C_real, -(C_real + 1) * DEL, -xgd * DEL
            ) + khat

        def pipe_step_band(k, state):
            prev, end, bound_in, last_bound, lb_acc, ck_acc = state
            j = k - d  # this device's row block this step
            active = (j >= 0) & (j < J)
            jc = jnp.clip(j, 0, J - 1)
            t_rows = lax.dynamic_slice(t_full, (jc * tr,), (tr,))
            ys = jc * tr + 1 + jnp.arange(tr, dtype=jnp.int32)
            borders = border(ys)
            bl_cur = jnp.where(d == 0, borders, bound_in)
            lb = jnp.concatenate([last_bound[None], bl_cur])
            # entering-lane scalar streams (lane j enters at step j+1
            # with diag lb[j] and left lb[j+1]; only slots < tr are read)
            lbp = jnp.zeros(D_pad, jnp.int32).at[:tr].set(lb[:tr])
            lbc = jnp.zeros(D_pad, jnp.int32).at[:tr].set(lb[1:])
            c1 = lbp + (dvec - 2) * EXT
            c2 = lbc + (dvec - 1) * EXT
            c2 = c2.at[0].add(
                jnp.where((jc == 0) & (d == 0), -(DEL - EXT), 0)
            )
            # fill stream: the carried prev with the (1,1) del-up
            # correction (simple/mod.rs:72 — the only del-penalty cell);
            # lane-0 diag stream: the CLEAN prev shifted one slot
            f = prev.at[0].add(
                jnp.where((jc == 0) & (d == 0), -(DEL - EXT), 0)
            )
            fd = jnp.concatenate([jnp.zeros(1, jnp.int32), prev[:-1]])
            j_end_ = jnp.int32(R_real) - 1 - jc * tr
            x_loc = jnp.int32(C_real) - x0
            d_end_ = x_loc + j_end_
            owns = (
                active
                & (j_end_ >= 0) & (j_end_ < tr)
                & (x_loc >= 1) & (x_loc <= Cb)
            )
            scal = jnp.stack(
                [j_end_, d_end_, owns.astype(jnp.int32)]
            ).reshape(1, 3)
            rb, rc, endv = run_block_band(
                t_rows.reshape(S_band, 128),
                qs,
                f.reshape(n_chunks, 1, BAND_TD),
                c1.reshape(n_chunks, 1, BAND_TD),
                c2.reshape(n_chunks, 1, BAND_TD),
                fd.reshape(n_chunks, 1, BAND_TD),
                mat, scal,
                S=S_band, TD=BAND_TD, V=V, Cb=Cb, ext=ext_i,
                lut_bits=lut_bits, bias2=bias2, interpret=interpret,
            )
            # bottom-row stream (hat, slot k ↔ x = k+1-(tr-1)) → next
            # block's top-row stream (hat, slot k ↔ x = k+1): the de-hat
            # + slot shift + re-hat telescope to one constant offset
            rb_flat = rb.reshape(D_pad)
            new_prev = jnp.concatenate(
                [rb_flat[tr - 1:], jnp.zeros(tr - 1, jnp.int32)]
            ) - tr * EXT
            rights = rc.reshape(tr)
            prev = jnp.where(active, new_prev, prev)
            end = jnp.where(owns, endv[0, 0], end)
            rights = jnp.where(active, rights, jnp.zeros_like(rights))
            new_last = jnp.where(active, bl_cur[-1], last_bound)
            if with_trace:
                lb_at = jnp.where(active, jc * tr, jnp.int32(R_pad))
                lb_acc = lax.dynamic_update_slice(lb_acc, bl_cur, (lb_at,))
                is_ck = active & ((jc + 1) % stride == 0)
                ck_at = jnp.where(
                    is_ck, (jc + 1) // stride - 1, jnp.int32(n_ck)
                )
                ck_row = prev[:Cb] - khat[:Cb]  # de-hatted H row
                ck_acc = lax.dynamic_update_slice(
                    ck_acc, ck_row[None], (ck_at, jnp.int32(0))
                )
            bound_next = lax.ppermute(
                rights, axis, [(i, (i + 1) % n) for i in range(n)]
            )
            return (prev, end, bound_next, new_last, lb_acc, ck_acc)

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
            prev, end, bound_in, last_bound, lb_acc, ck_acc = state
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
                scal = jnp.stack([
                    x0, jc * tr, jnp.int32(C_real), jnp.int32(R_real)
                ]).reshape(1, 4)
                h_new, rights2d, endv = run_block_cs(
                    pw,
                    t_rows.reshape(1, tr),
                    prev.reshape(S_loc, 128), lb.reshape(1, tr + 1),
                    scal,
                    S=S_loc, TR=tr, V=V,
                    del_=int(DEL), ext=int(EXT), interpret=interpret,
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
            if with_trace:
                # record the consumed left boundary and (every stride-th
                # block) the finished H row.  Inactive steps write to the
                # trash slot at the end of each accumulator — in-place
                # dynamic_update_slice on the loop carry, no O(R) where
                lb_at = jnp.where(active, jc * tr, jnp.int32(R_pad))
                lb_acc = lax.dynamic_update_slice(lb_acc, bl_cur, (lb_at,))
                is_ck = active & ((jc + 1) % stride == 0)
                ck_at = jnp.where(
                    is_ck, (jc + 1) // stride - 1, jnp.int32(n_ck)
                )
                ck_acc = lax.dynamic_update_slice(
                    ck_acc, prev[None], (ck_at, jnp.int32(0))
                )
            # ship this block's right boundary one device over ICI
            bound_next = lax.ppermute(
                rights, axis, [(i, (i + 1) % n) for i in range(n)]
            )
            return (prev, end, bound_next, new_last, lb_acc, ck_acc)

        # seed last_bound with H[0, x0] (1-based column x0 = this
        # device's left-neighbor column) — a border-ROW value, closed
        # form for every device: -(x0)*del with the far-corner overwrite
        lb0 = jnp.where(
            x0 == C_real, -(jnp.int32(C_real) + 1) * DEL, -x0 * DEL
        )
        if with_trace:
            lb_acc0 = jnp.zeros(R_pad + tr, jnp.int32)
            ck_acc0 = jnp.zeros((n_ck + 1, Cb), jnp.int32)
        else:
            lb_acc0 = jnp.zeros((), jnp.int32)
            ck_acc0 = jnp.zeros((), jnp.int32)
        init = (
            prev0 if engine == "band" else h0,
            jnp.int32(NEG),
            jnp.zeros(tr, jnp.int32),
            lb0,
            lb_acc0,
            ck_acc0,
        )
        prev, end, _, _, lb_acc, ck_acc = lax.fori_loop(
            0, J + n - 1,
            pipe_step_band if engine == "band" else pipe_step,
            init,
        )
        del prev
        end = jax.lax.psum(jnp.where(end == NEG, 0, end), axis)
        if with_trace:
            if replicate_trace:
                return (
                    end,
                    lax.all_gather(lb_acc[:R_pad], axis),
                    lax.all_gather(ck_acc[:n_ck], axis, axis=1, tiled=True),
                )
            return end, lb_acc[None, :R_pad], ck_acc[:n_ck]
        return end

    return run


def sharded_global_end_score(
    mesh: Mesh,
    q: np.ndarray,
    t: np.ndarray,
    matrix: np.ndarray,
    del_: float,
    ext: float,
    *,
    tr: int | None = None,
    axis: str | None = None,
    engine: str | None = None,
    interpret: bool | None = None,
) -> float:
    """Exact global end score H[tlen, qlen] of one pair, columns sharded
    over the mesh axis.  Requires an integral matrix and penalties
    (int32 arithmetic — bit-exact vs the oracle).

    ``engine``: "pallas" runs each device's row-block through the
    column-sharded row-scan kernel (ops/wavefront.run_block_cs);
    "band" through the scan-free band-diagonal block kernel
    (ops/wavefront.run_block_band — the per-device speed path at
    band-height ``tr``, which it rounds to a multiple of 128); "lax"
    uses the portable gather+cummax block fill.  Default: pallas on
    TPU, lax elsewhere.
    """
    pp = _prep_sharded(mesh, q, t, matrix, del_, ext, tr, axis, engine,
                       interpret)
    out = _pipeline(mesh, pp, with_trace=False)
    return float(np.asarray(out))


def _lax_tile_dirs(q_codes, mat, t_rows, h0, lb, x0, y_base,
                   DEL, EXT, V):
    """Direction tile (TB, Cb) of one replayed block, plain lax — the
    replay engine matching the "lax" forward fill.  Bit-identical
    recurrence; dirs by the exact tie policy (top > left > diagonal).

    NOTE: this recurrence intentionally exists in four forms (the
    pipeline's ``row_fill``, this replay, the pallas
    ``_kernel_block_cs``, and the band-diagonal ``_kernel_band_cs``)
    because each runs in a different execution context (shard_map scan
    / host-driven replay / Mosaic kernel) with different operand
    layouts.  Any edit to one MUST be mirrored in the others; the
    parity suite pins all four bit-for-bit against the f64 oracle on
    every run (test_wavefront_sp: forward end-scores AND replayed-walk
    alignments for every engine), so a missed mirror cannot land
    green."""
    Cb = q_codes.shape[0]
    xg = x0 + jnp.arange(Cb, dtype=jnp.int32)
    xp = (xg + 1) * EXT

    def row(carry, inputs):
        prev = carry
        ty, bl_prev, bl_cur, y = inputs
        srow = mat[ty][jnp.clip(q_codes, 0, V - 1)]
        srow = jnp.where(q_codes >= V, NEG, srow)
        diag = jnp.concatenate([bl_prev[None], prev[:-1]]) + srow
        m0 = jnp.maximum(diag, prev - EXT)
        is11 = (y == 1) & (x0 == 0)
        pen1 = jnp.where(is11, DEL, EXT)
        a0 = jnp.where(is11, jnp.maximum(diag[0], prev[0] - DEL), m0[0])
        a0 = jnp.maximum(a0, bl_cur - pen1)
        a = m0.at[0].set(a0)
        h = lax.cummax(a + xp) - xp
        first = jnp.arange(Cb) == 0
        pen_d = jnp.where(is11 & first, DEL, EXT)
        top = prev - pen_d
        leftv = jnp.concatenate([bl_cur[None], h[:-1]]) - pen_d
        from ..ops.scan_engine import DIAG as _D, LEFT as _L, TOP as _T

        dr = jnp.where(
            h <= top,
            jnp.uint8(_T),
            jnp.where(h <= leftv, jnp.uint8(_L), jnp.uint8(_D)),
        )
        return h, dr

    TB = t_rows.shape[0]
    ys = y_base + 1 + jnp.arange(TB, dtype=jnp.int32)
    bl_prev = lb[:-1]
    bl_cur = lb[1:]
    _, dirs = lax.scan(row, h0, (t_rows, bl_prev, bl_cur, ys))
    return dirs


_lax_tile_dirs_jit = jax.jit(
    _lax_tile_dirs,
    static_argnames=("V",),
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "engine", "S_loc", "TB", "V", "del_",
        "ext", "interpret", "NCK", "n", "Cb",
    ),
)
def _replay_walk_all_sharded(
    qp_dev, pw_all, mat_i32, tp_dev, ckpts_dev, lb_hist_dev,
    *, engine, S_loc, TB, V, C_real, R_real, del_, ext, interpret,
    NCK, n, Cb,
):
    """Replay and walk the ENTIRE sharded traceback in one dispatch.

    Mirror of ops.wavefront._replay_walk_all with a second (column-
    block) tile axis: an outer ``while_loop`` visits the
    (tb-row × device-column) tiles the walk crosses, refilling each
    from its forward H-row checkpoint + left-boundary history on
    device (`run_block_cs` for the pallas engine, `_lax_tile_dirs` for
    lax) and walking it in place — the host sees one launch and the
    2-bit step stream for the whole traceback instead of one dispatch
    + direction tile per crossed tile.

    ``pw_all`` is the (n, n_words, S_loc, 128) per-device packed query
    words (pallas engine; a (1,) dummy otherwise); ``ckpts_dev`` is
    (NCK, n·Cb) with ckpts[k] = H[(k+1)·TB]; ``lb_hist_dev`` is
    (n, NCK·TB) with lb_hist[d, y-1] = H[y, d·Cb].

    Returns (packed steps — 16/word, BEG-padded; n steps; final cy;
    final cx) with the final cursor on a border.
    """
    from ..ops.scan_engine import BEG
    from ..ops.wavefront import (
        ROWS_PER_WORD, pack_walk_steps, packed_words_get_d,
        run_block_cs, walk_tile_inner,
    )

    DEL = jnp.int32(del_)
    C_tot = n * Cb
    BUD16 = _cdiv(NCK * TB + C_tot + 1, 16) * 16

    def outer_cond(c):
        cy, cx, _, _ = c
        return (cy > 0) & (cx > 0)

    def outer_body(c):
        cy, cx, nn, buf = c
        j = (cy - 1) // TB
        d = (cx - 1) // Cb
        x0 = d * Cb
        # checkpoint row (or the closed-form border row for j == 0,
        # incl. the far-corner overwrite, simple/mod.rs:59-70)
        xg1 = x0 + 1 + jnp.arange(Cb, dtype=jnp.int32)
        border_h0 = jnp.where(xg1 == C_real, -(C_real + 1) * DEL,
                              -xg1 * DEL)
        ck_row = lax.dynamic_slice(
            ckpts_dev, (jnp.maximum(j - 1, 0), x0), (1, Cb)
        )[0]
        h0 = jnp.where(j == 0, border_h0, ck_row).astype(jnp.int32)
        # left-boundary column for the tile (lb[0] = H[j·TB, x0])
        lb0_border = jnp.where(x0 == C_real, -(C_real + 1) * DEL,
                               -x0 * DEL)
        lb_prev = lax.dynamic_slice(
            lb_hist_dev, (d, jnp.maximum(j * TB - 1, 0)), (1, 1)
        )[0, 0]
        lb0 = jnp.where(j == 0, lb0_border, lb_prev).astype(jnp.int32)
        lb = jnp.concatenate([
            lb0[None],
            lax.dynamic_slice(lb_hist_dev, (d, j * TB), (1, TB))[0],
        ])
        t_rows = lax.dynamic_slice(tp_dev, (j * TB,), (TB,))
        if engine == "pallas":
            pw = lax.dynamic_index_in_dim(pw_all, d, axis=0,
                                          keepdims=False)
            scal = jnp.stack([
                x0.astype(jnp.int32), (j * TB).astype(jnp.int32),
                jnp.int32(C_real), jnp.int32(R_real),
            ]).reshape(1, 4)
            outs = run_block_cs(
                pw, t_rows.reshape(1, TB), h0.reshape(S_loc, 128),
                lb.reshape(1, TB + 1), scal,
                S=S_loc, TR=TB, V=V,
                del_=del_, ext=ext, interpret=interpret,
                with_dirs=True,
            )
            flat = outs[3].reshape(TB // ROWS_PER_WORD, Cb)
            get_d = packed_words_get_d(flat)
        else:
            q_codes = lax.dynamic_slice(qp_dev, (x0,), (Cb,))
            dirs = _lax_tile_dirs(
                q_codes, mat_i32, t_rows, h0, lb, x0, j * TB,
                DEL, jnp.int32(ext), V,
            )

            def get_d(r, c):
                return dirs[r, c].astype(jnp.int32)

        y, x, nn, buf = walk_tile_inner(
            get_d, cy - j * TB, cx - x0, nn, buf
        )
        return (j * TB + y, x0 + x, nn, buf)

    init = (
        jnp.int32(R_real),
        jnp.int32(C_real),
        jnp.int32(0),
        jnp.full((BUD16,), BEG, jnp.int32),
    )
    cy, cx, nn, buf = lax.while_loop(outer_cond, outer_body, init)
    return pack_walk_steps(buf), nn, cy, cx


def sharded_global_align(
    mesh: Mesh,
    q: np.ndarray,
    t: np.ndarray,
    matrix: np.ndarray,
    del_: float,
    ext: float,
    *,
    tr: int | None = None,
    tb_rows: int = 512,
    axis: str | None = None,
    engine: str | None = None,
    interpret: bool | None = None,
):
    """Exact global ALIGNMENT of one huge pair, columns sharded over the
    mesh axis — checkpoint-and-replay traceback on top of the pipeline.

    Returns ``(end_score, qa, ta, coords)`` with the reference's
    traceback semantics (seeded last characters, simple/mod.rs:99-127),
    bit-equal to the oracle/single-chip paths.  ``tb_rows`` is the
    checkpoint cadence (rounded to a multiple of ``tr``): forward extra
    memory is O(R·n + R·C/tb_rows) ints; traceback replays one
    (tb_rows × column-block) tile per block the path crosses (~2x fill
    cost total, same as the single-chip chunked path).
    """
    from ..alphabet import BLANK
    from ..ops.scan_engine import LEFT, TOP

    pp = _prep_sharded(mesh, q, t, matrix, del_, ext, tr, axis, engine,
                       interpret, tb_rows=tb_rows)
    C_real, R_real = pp["C_real"], pp["R_real"]
    if C_real == 0 or R_real == 0:
        raise ValueError("empty sequence")
    q_np, t_np = pp["q"], pp["t"]
    Cb, n, engine = pp["Cb"], pp["n"], pp["engine"]
    replay_engine = pp["replay_engine"]
    stride, n_ck = pp["stride"], pp["n_ck"]
    tr = pp["tr"]  # band engine may have rounded/clamped it
    TB = stride * tr

    end_dev, lb_hist_dev, ckpts_dev = _pipeline(mesh, pp, with_trace=True)
    end = float(np.asarray(end_dev))
    multiproc = len({d.process_index for d in mesh.devices.flat}) > 1
    if multiproc:
        # the pipeline all-gathered the trace records (replicate_trace),
        # so each process reads the fully-replicated arrays and re-hosts
        # them as process-LOCAL arrays — the replay/walk below is then an
        # ordinary single-controller computation, run redundantly (and
        # identically: same records, same walk) on every process
        lb_hist_dev = jnp.asarray(np.asarray(lb_hist_dev))
        ckpts_dev = jnp.asarray(np.asarray(ckpts_dev))
    # the trace records stay ON DEVICE for the default fused walk —
    # pulling them to host (and re-uploading) cost ~6 s of tunnel
    # transfer at 64k x 64k (33 MB of checkpoints both ways, round-4
    # fix); only the host-walk fallback materializes numpy copies
    use_device_walk = os.environ.get("ALIGNER_DEVICE_WALK", "1") != "0"
    lb_hist = ckpts = None
    if not use_device_walk:
        lb_hist = np.asarray(lb_hist_dev)  # (n, R_pad): H[y, x0_d]
        ckpts = np.asarray(ckpts_dev)  # (n_ck, C_pad): H[(k+1)*TB, ...]

    DEL_i, EXT_i = int(pp["DEL"]), int(pp["EXT"])
    V = pp["V"]
    tp = pp["tp"]

    def border_row_vals(xg1):
        # H[0, x] closed form with the far-corner overwrite
        out = -xg1 * DEL_i
        out[xg1 == C_real] = -(C_real + 1) * DEL_i
        return out

    if replay_engine == "pallas":
        from ..ops.wavefront import (
            _unpack_dir_words, pack_query_words, run_block_cs,
        )

        S_loc = pp["S_loc"]
        # the replay kernel (run_block_cs) wants the row-scan word
        # layout; a band forward ships its own transposed pack in mi
        pmat = pp["mi_replay"] if engine == "band" else pp["mi"]
        pw_cache: dict[int, jax.Array] = {}

    def _tile_inputs(j: int, d: int):
        """(x0, h0, lb, t_rows) replay operands for tile (j, d)."""
        x0 = d * Cb
        xg1 = x0 + 1 + np.arange(Cb)
        if j == 0:
            h0 = border_row_vals(xg1.copy()).astype(np.int32)
        else:
            h0 = ckpts[j - 1, x0 : x0 + Cb].astype(np.int32)
        lb = np.empty(TB + 1, np.int32)
        if j == 0:
            lb[0] = (
                -(C_real + 1) * DEL_i if x0 == C_real else -x0 * DEL_i
            )
        else:
            lb[0] = lb_hist[d, j * TB - 1]
        lb[1:] = lb_hist[d, j * TB : (j + 1) * TB]
        t_rows = tp[j * TB : (j + 1) * TB]
        return x0, h0, lb, t_rows

    def _pallas_pw(d: int, x0: int):
        if d not in pw_cache:
            q_tile = jnp.asarray(
                pp["qp"][x0 : x0 + Cb].reshape(S_loc, 128)
            )
            pw_cache[d] = pack_query_words(q_tile, pmat, V)
        return pw_cache[d]

    def replay_tile(j: int, d: int) -> np.ndarray:
        """uint8 dirs (TB, Cb) for rows j*TB+1..(j+1)*TB, device-d cols."""
        x0, h0, lb, t_rows = _tile_inputs(j, d)
        if replay_engine == "pallas":
            outs = run_block_cs(
                _pallas_pw(d, x0),
                jnp.asarray(t_rows.reshape(1, TB)),
                jnp.asarray(h0.reshape(S_loc, 128)),
                jnp.asarray(lb.reshape(1, TB + 1)),
                jnp.asarray(
                    np.array([[x0, j * TB, C_real, R_real]], np.int32)
                ),
                S=S_loc, TR=TB, V=V,
                del_=DEL_i, ext=EXT_i, interpret=pp["interpret"],
                with_dirs=True,
            )
            return _unpack_dir_words(np.asarray(outs[3]), Cb)[:TB]
        dirs = _lax_tile_dirs_jit(
            jnp.asarray(pp["qp"][x0 : x0 + Cb]), pp["mat_i32"],
            jnp.asarray(t_rows), jnp.asarray(h0), jnp.asarray(lb),
            jnp.int32(x0), jnp.int32(j * TB),
            DEL=jnp.int32(DEL_i), EXT=jnp.int32(EXT_i), V=V,
        )
        return np.asarray(dirs)

    # --- backward walk (simple/mod.rs:99-127 semantics, tiled) ---
    # default: the WHOLE traceback (every crossed tile's replay + walk)
    # runs in one device dispatch; only the 2-bit step stream returns.
    # ALIGNER_DEVICE_WALK=0 restores the host per-cell walk
    qa_chunks = [np.array([q_np[-1]], np.int16)]
    ta_chunks = [np.array([t_np[-1]], np.int16)]
    cy, cx = R_real, C_real
    if use_device_walk:
        from ..ops.wavefront import steps_to_chunks

        dummy = jnp.zeros((1,), jnp.int32)
        if replay_engine == "pallas":
            from ..ops.wavefront import pack_query_words as _pqw

            pw_all = jnp.stack([
                _pqw(
                    jnp.asarray(
                        pp["qp"][dd * Cb : (dd + 1) * Cb]
                        .reshape(S_loc, 128)
                    ),
                    pmat, V,
                )
                for dd in range(n)
            ])
            qp_dev, mat_arg = dummy, dummy
        else:
            pw_all = dummy
            qp_dev = jnp.asarray(pp["qp"])
            mat_arg = pp["mat_i32"]
        packed, nn, cy_f, cx_f = _replay_walk_all_sharded(
            qp_dev, pw_all, mat_arg,
            jnp.asarray(tp), ckpts_dev, lb_hist_dev,
            engine=replay_engine, S_loc=pp["S_loc"], TB=TB, V=V,
            C_real=C_real, R_real=R_real, del_=DEL_i, ext=EXT_i,
            interpret=pp["interpret"], NCK=ckpts_dev.shape[0], n=n, Cb=Cb,
        )
        qa_c, ta_c = steps_to_chunks(packed, int(nn), cy, cx, q_np, t_np)
        qa_chunks.append(qa_c)
        ta_chunks.append(ta_c)
        cy, cx = int(cy_f), int(cx_f)
    else:
        cur_tile = None
        tile = None
        while cy > 0 and cx > 0:
            j, d = (cy - 1) // TB, (cx - 1) // Cb
            if (j, d) != cur_tile:
                tile = replay_tile(j, d)
                cur_tile = (j, d)
            dr = tile[cy - 1 - j * TB, cx - 1 - d * Cb]
            if dr == TOP:
                qa_chunks.append(np.array([BLANK], np.int16))
                ta_chunks.append(np.array([t_np[cy - 1]], np.int16))
                cy -= 1
            elif dr == LEFT:
                qa_chunks.append(np.array([q_np[cx - 1]], np.int16))
                ta_chunks.append(np.array([BLANK], np.int16))
                cx -= 1
            else:  # DIAG (BEG cannot occur in global interiors)
                qa_chunks.append(np.array([q_np[cx - 1]], np.int16))
                ta_chunks.append(np.array([t_np[cy - 1]], np.int16))
                cy -= 1
                cx -= 1
    if cx > 0:
        # border row: LEFT until (0, 0) (simple/mod.rs:61)
        qa_chunks.append(q_np[:cx][::-1].astype(np.int16))
        ta_chunks.append(np.full(cx, BLANK, np.int16))
    if cy > 0:
        # border column: TOP until (0, 0) (simple/mod.rs:66)
        qa_chunks.append(np.full(cy, BLANK, np.int16))
        ta_chunks.append(t_np[:cy][::-1].astype(np.int16))
    qa = np.concatenate(qa_chunks)[::-1]
    ta = np.concatenate(ta_chunks)[::-1]
    return (
        end,
        np.ascontiguousarray(qa),
        np.ascontiguousarray(ta),
        ((1, C_real), (1, R_real)),
    )
