"""Pallas TPU kernel for the batched exact DP fill.

Design (see ops/scan_engine.py for why the batch is the parallel axis):

* One DP problem per (sublane, lane) slot: a kernel tile processes
  ``BT = BS*128`` problems at once; every per-cell op is a full
  ``(BS, 128)`` vector op on the VPU.
* Grid = (batch_tiles, columns).  Each grid step fills one DP column for
  the whole tile, in the reference's column-major fill order, carrying the
  single mutable gap-penalty state across cells and columns
  (simple/mod.rs:72,88-92).  The column buffer lives in VMEM scratch and
  is updated in place (each cell reads the previous column's value before
  overwriting it, carrying it as the next cell's diagonal) and persists
  across grid steps; direction/score planes stream out to HBM through the
  pallas output pipeline (one block per column).
* Score lookup: a per-column LUT over the V symbols is built once per
  grid step (one-hot over the column's query code; for integral shared
  matrices the LUT rows come pre-packed as 4 biased bytes — or, when the
  entry range spans <= 16 values as BLOSUM62's -4..11 does, 8 biased
  nibbles — per int32 word, see :func:`lut_params`), then each row's
  score is selected by the target code's bits through a balanced
  where-tree (``_bit_select``, ceil(log2(n)) select levels + a
  variable-shift extract on the packed path) — ~9-11 int ops/cell, the
  cheapest measured formulation without per-lane gathers
  (docs/PERF_NOTES.md records the tried-and-slower variants).
* The row loop is unrolled 8× (the per-cell max→penalty dependent chain
  is latency-bound otherwise); wrappers pad R to a multiple of 8.
* ``scores_only`` mode tracks the running first-in-row-major argmax
  (value desc, y asc, x asc) and ``a[tlen, qlen]`` in registers and
  writes nothing to HBM; it also skips the direction tie-break entirely
  (dir == Beginning ⟺ score == 0 drives the penalty update).  Extra
  static specializations: ``dense`` (no length masks when the batch has
  no padding), ``track_argmax=False`` (running max only), and a
  direction-only full mode (2-bit packed words, 8 cells per int32,
  unpacked host-side next to the traceback consumers).

Semantics are bit-identical to the scalar oracle (tests fuzz every mode in
interpret mode and on hardware); f32 is exact for integer-valued matrices.
Measured: ~204 GCUPS protein (4-bit nibble LUT) / ~318 GCUPS DNA on one
v5e chip (marginal per-launch rate; docs/PERF_NOTES.md for methodology —
the round-1 numbers were CSE-inflated and are corrected there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..backend import on_tpu
from .scan_engine import BEG, DIAG, LEFT, TOP, FillResult

LANES = 128

# byte → its four 2-bit direction codes (for host-side plane unpacking)
_UNPACK_LUT = np.array(
    [[(b >> (2 * k)) & 3 for k in range(4)] for b in range(256)], dtype=np.uint8
)


def _cdiv(a, b):
    return -(-a // b)


def _bit_select(vals, codes, start_bit: int):
    """Select vals[k] per element by the bits of ``codes`` starting at
    ``start_bit`` — a balanced binary where-tree (ceil(log2(n)) levels),
    cheaper than an n-way compare+multiply select."""
    cur = list(vals)
    bit = start_bit
    while len(cur) > 1:
        b = (codes & bit) != 0
        nxt = []
        for i in range(0, len(cur) - 1, 2):
            nxt.append(jnp.where(b, cur[i + 1], cur[i]))
        if len(cur) % 2:
            nxt.append(cur[-1])
        cur = nxt
        bit <<= 1
    return cur[0]


def _kernel(
    refs,
    *,
    C: int,
    R: int,
    V: int,
    BS: int,
    mode: str,
    batched_mat: bool,
    packed_lut: bool,
    lut_bits: int,
    lut_bias: int,
    dense: bool,
    track_argmax: bool,
    with_planes: bool,
    with_scores_plane: bool,
    del_: float,
    ext: float,
    dtype,
):
    if mode == "pwm":
        (t_ref, tlen_ref, mat_ref) = refs[:3]
        refs = refs[3:]
        q_ref = qlen_ref = None
    else:
        (q_ref, t_ref, qlen_ref, tlen_ref, mat_ref) = refs[:5]
        refs = refs[5:]
    fmax_ref, fy_ref, fx_ref, end_ref = refs[:4]
    refs = refs[4:]
    if with_planes:
        dirs_ref = refs[0]
        refs = refs[1:]
    if with_scores_plane:
        plane_ref = refs[0]
        refs = refs[1:]
    colbuf_ref, penb_ref = refs

    x = pl.program_id(1)
    x1 = x + 1
    is_global = mode == "global"
    DEL = jnp.asarray(del_, dtype)
    EXT = jnp.asarray(ext, dtype)
    # eps drives the tie test m - top < eps with m >= top always; the
    # int32-DP analog of "tiny positive" is 1 (m - top < 1 ⟺ m == top)
    eps = (
        jnp.asarray(jnp.finfo(dtype).eps, dtype)
        if jnp.issubdtype(dtype, jnp.floating)
        else jnp.asarray(1, dtype)
    )
    zero = jnp.zeros((BS, LANES), dtype)

    tlen = tlen_ref[0]  # (BS, 128) i32
    if mode == "pwm":
        qlen = jnp.full((BS, LANES), C, jnp.int32)
    else:
        qlen = qlen_ref[0]

    @pl.when(x == 0)
    def _init():
        if is_global:
            yy = lax.broadcasted_iota(jnp.int32, (R + 1, BS, LANES), 0)
            tl3 = tlen[None].astype(dtype)
            yyf = yy.astype(dtype)
            colbuf_ref[:] = jnp.where(
                yy == tlen[None], -(tl3 + 1) * DEL, -yyf * DEL
            )
        else:
            colbuf_ref[:] = jnp.zeros((R + 1, BS, LANES), dtype)
        penb_ref[:] = jnp.full((BS, LANES), DEL)
        fmax_ref[0] = zero
        fy_ref[0] = jnp.zeros((BS, LANES), jnp.int32)
        fx_ref[0] = jnp.zeros((BS, LANES), jnp.int32)
        end_ref[0] = zero

    # --- border value a[0, x1] of this column (simple/mod.rs:59-70) ---
    if is_global:
        qlf = qlen.astype(dtype)
        border0 = jnp.where(
            x1 == qlen, -(qlf + 1) * DEL, -jnp.asarray(x1, dtype) * DEL
        )
    else:
        border0 = zero

    # --- per-row score lookup: s[y] = matrix[t[y], q[x]] (or pwm) ---
    # Selection happens per row inside the cell loop via a binary select
    # tree over t's code bits (_bit_select): ceil(log2(n)) where-levels,
    # (BS, 128)-sized temporaries, roughly half the ops of the previous
    # V-way multiply-select over a full (R, BS, 128) score column (and
    # no scol scratch at all).  The per-column LUT values below are
    # (BS, 128) (or scalars for shared PWMs) and stay live across rows.
    if packed_lut:
        # Integral shared matrix: mat_ref holds the column-packed words
        # (n_words, V) int32, precomputed once in _run.  ``lut_bits=8``
        # (|entries| <= 127): word g of matrix column j is the 4 biased
        # bytes mat[4g..4g+3, j].  ``lut_bits=4`` (entry range <= 15,
        # e.g. BLOSUM62's exact -4..11): 8 nibbles mat[8g..8g+7, j]-bias
        # per word — V=24 needs 3 words instead of 6, so the per-cell
        # select tree shrinks from 3 tests + 5 selects to 2 + 2.
        qx = q_ref[0]  # (BS, 128) i32
        ohs_i = [(qx == j).astype(jnp.int32) for j in range(V)]
        per_word = 8 if lut_bits == 4 else 4
        n_words = _cdiv(V, per_word)
        packed = [
            functools.reduce(
                lambda a, b: a + b,
                [mat_ref[g, j] * ohs_i[j] for j in range(V)],
            )
            for g in range(n_words)
        ]

        if lut_bits == 4:
            def score_at(y):
                t_row = t_ref[y]
                w = _bit_select(packed, t_row, start_bit=8)
                sh = (t_row & 7) << 2
                return (((w >> sh) & 15) + lut_bias).astype(dtype)
        else:
            def score_at(y):
                t_row = t_ref[y]
                w = _bit_select(packed, t_row, start_bit=4)
                sh = (t_row & 3) << 3
                return (((w >> sh) & 255) - 128).astype(dtype)
    else:
        if mode == "pwm":
            if batched_mat:
                luts = [mat_ref[v * C + x] for v in range(V)]
            else:
                luts = [mat_ref[v, x] for v in range(V)]
        else:
            qx = q_ref[0]  # (BS, 128) i32
            ohs = [(qx == j).astype(dtype) for j in range(V)]
            if batched_mat:
                luts = [
                    functools.reduce(
                        lambda a, b: a + b,
                        [mat_ref[v * V + j] * ohs[j] for j in range(V)],
                    )
                    for v in range(V)
                ]
            else:
                luts = [
                    functools.reduce(
                        lambda a, b: a + b,
                        [mat_ref[v, j] * ohs[j] for j in range(V)],
                    )
                    for v in range(V)
                ]

        def score_at(y):
            return jnp.asarray(
                _bit_select(luts, t_ref[y], start_bit=1), dtype
            )

    # the column buffer is updated in place: each cell reads the previous
    # column's value before overwriting it and carries it as the next
    # cell's diagonal
    active_x = x1 <= qlen

    pen0 = penb_ref[:]
    diag0 = colbuf_ref[0]
    colbuf_ref[0] = border0
    best0 = (fmax_ref[0], fy_ref[0], fx_ref[0])
    end0 = end_ref[0]

    # integral matrix AND integral penalties ⇒ every DP value is an
    # exact small integer in f32, so the ε tie tests collapse to plain
    # <= compares and max/sub reassociation is exact — the optimized
    # direction chain below relies on both (round-4 ablation)
    exact_ties = packed_lut and del_ == int(del_) and ext == int(ext)

    def body(y1, carry, sh=0):
        a_up, pen, diag_prev, bv, by, bx, ev = carry
        left_v = colbuf_ref[y1]
        s = score_at(y1 - 1)
        diag = diag_prev + s
        if with_planes and exact_ties:
            # shared-subtract max (exact for integers) + ONE m+pen add
            # replaces two top/left subtractions, and the ε tests
            # become raw-neighbor compares: m <= top ⟺ m+pen <= a_up.
            # Codes come pre-shifted to this cell's 2-bit slot (``sh``,
            # static per unroll position) so the word pack below needs
            # no per-cell shift.  Saves 3 vector ops/cell vs the
            # general chain (116 → measured round 4, BENCH_modes).
            m = jnp.maximum(jnp.maximum(a_up, left_v) - pen, diag)
            mp = m + pen
            d = jnp.where(
                mp <= a_up,
                jnp.int32(TOP << sh),
                jnp.where(
                    mp <= left_v,
                    jnp.int32(LEFT << sh),
                    jnp.int32(DIAG << sh),
                ),
            )
            if not is_global:
                d = jnp.where(m == 0, jnp.int32(BEG << sh), d)
        elif with_planes:
            top = a_up - pen
            left = left_v - pen
            m = jnp.maximum(jnp.maximum(top, left), diag)
            d = jnp.where(
                m - top < eps,
                jnp.int32(TOP << sh),
                jnp.where(
                    m - left < eps,
                    jnp.int32(LEFT << sh),
                    jnp.int32(DIAG << sh),
                ),
            )
            if not is_global:
                d = jnp.where(m == 0, jnp.int32(BEG << sh), d)
        else:
            # max(a-p, b-p) == max(a,b)-p exactly (float sub is monotone
            # and ties give the same value) — one sub saved per cell
            m = jnp.maximum(jnp.maximum(a_up, left_v) - pen, diag)
            d = None  # scores-only: the direction is consumed solely via
            # the penalty update, and dir == Beginning ⟺ m == 0 (local)
            # / never (global) — enums.rs:30-46
        def next_pen():
            if d is not None:
                return jnp.where(d == (BEG << sh), DEL, EXT)
            if is_global:
                return jnp.broadcast_to(EXT, (BS, LANES))
            return jnp.where(m == 0, DEL, EXT)
        if dense:
            # every problem fills every cell — no length masks
            pen = next_pen()
            val, dc = m, d
        else:
            active = active_x & (y1 <= tlen)
            pen = jnp.where(active, next_pen(), pen)
            val = jnp.where(active, m, zero)
            dc = (
                jnp.where(active, d, jnp.int32(BEG << sh))
                if d is not None
                else None
            )
        colbuf_ref[y1] = val
        if with_scores_plane:
            plane_ref[0, y1 - 1] = val
        if track_argmax:
            act = True if dense else active
            # first-max in row-major order (value desc, y asc, x asc;
            # simple/mod.rs:212).  The full lexicographic tie clause
            # collapses: candidates arrive in (x asc, y asc) VISIT
            # order, so a tied stored best always has bx <= x1, and
            # bx == x1 implies by < y1 — the (y1 == by) & (x1 < bx)
            # disjunct can never fire.  Equivalent with 3 fewer vector
            # ops per cell (round 4; pinned by the oracle fuzz suites).
            better = (m > bv) | ((m == bv) & (y1 < by))
            if not dense:
                better = act & better
            bv = jnp.where(better, m, bv)
            by = jnp.where(better, y1, by)
            bx = jnp.where(better, x1, bx)
            evm = (y1 == tlen) & (x1 == qlen)
            if not dense:
                evm = act & evm
            ev = jnp.where(evm, m, ev)
        else:
            bv = jnp.maximum(bv, val)
        return (val, pen, left_v, bv, by, bx, ev), dc

    # Unroll the cell loop: each cell's ~6-op dependent chain (max → dir →
    # penalty → next top) is latency-bound at small BS; unrolling amortizes
    # loop overhead and lets off-chain work (scores, argmax tracking,
    # stores) fill the latency slots.  R is padded to a multiple of UNROLL
    # by the wrapper; masking keeps padded rows inert.
    UNROLL = 8
    assert R % UNROLL == 0, "wrapper must pad R to a multiple of UNROLL"

    def block(base, carry):
        # directions pack 2 bits per cell, 8 cells (one unroll block) per
        # int32 word — 1/8 the full-mode HBM write traffic
        word = jnp.zeros((BS, LANES), jnp.int32)
        for j in range(UNROLL):
            # sh = this cell's 2-bit slot, static per unroll position:
            # body emits pre-shifted codes so the pack is a plain OR
            carry, dc = body(base * UNROLL + 1 + j, carry, sh=2 * j)
            if with_planes:
                word = word | dc
        if with_planes:
            dirs_ref[0, base] = word
        return carry

    (_, pen, _, bv, by, bx, ev) = lax.fori_loop(
        0, R // UNROLL, block, (border0, pen0, diag0, *best0, end0)
    )
    penb_ref[:] = pen
    fmax_ref[0] = bv
    fy_ref[0] = by
    fx_ref[0] = bx
    end_ref[0] = ev


def lut_params(matrix) -> tuple[bool, int, int]:
    """(packed_lut, lut_bits, lut_bias) for a concrete (numpy) shared
    matrix.  4-bit packing applies when the integral entry range spans
    at most 16 values (BLOSUM62 is exactly -4..11) — half the packed
    words, so the per-cell select tree loses a level and three selects."""
    m = np.asarray(matrix)
    if m.ndim != 2 or not (
        np.all(m == np.round(m)) and np.abs(m).max(initial=0) <= 127
    ):
        return False, 8, 0
    mi = np.round(m).astype(np.int64)
    lo, hi = int(mi.min()), int(mi.max())
    if hi - lo <= 15:
        return True, 4, lo
    return True, 8, 0


def lut_matrix_arg(matrix, dtype, enable: bool = True):
    """Shared packed-LUT matrix prep for the kernel launch paths.

    Returns ``(mat_arg, packed, lut_bits, lut_bias)`` — the device
    matrix operand (int32 when the packed-LUT fast path applies, else
    ``dtype``) plus the LUT parameters.  One place decides eligibility
    and the cast so the sharded / non-sharded / device-dirs launch
    paths cannot drift apart."""
    matrix_np = np.asarray(matrix)
    packed, lut_bits, lut_bias = (
        lut_params(matrix_np)
        if (enable and matrix_np.ndim == 2)
        else (False, 8, 0)
    )
    mat_arg = jnp.asarray(
        np.round(matrix_np).astype(np.int32) if packed else matrix_np,
        jnp.int32 if packed else dtype,
    )
    return mat_arg, packed, lut_bits, lut_bias


def _pick_bs(R: int, C: int, V: int, with_planes: bool, batched_mat: bool,
             scores_plane: bool = True, mat_rows: int | None = None) -> int:
    """Largest BS (sublane groups per tile) whose VMEM footprint fits.

    ``mat_rows``: flattened per-problem matrix rows when ``batched_mat``
    — V*V for pair matrices (default), 4*W for batched PWMs (whose
    block is (4·W, BS, 128), NOT (V·V, ...))."""
    budget = 15 * 1024 * 1024  # scoped-vmem limit is 16M; leave headroom
    for bs in (32, 16, 8, 4, 2, 1):
        rows = (R + 1) + 2  # colbuf scratch + pen/tracking
        rows += 2 * R  # t-codes input block (pipeline double-buffers it)
        rows += 8  # q/qlen/tlen + small outputs, double-buffered
        if batched_mat:
            rows += 2 * (V * V if mat_rows is None else mat_rows)
        if with_planes:
            rows += 2 * (R // 8)  # packed dirs words, double-buffered
            if scores_plane:
                rows += 2 * R  # f32 plane blocks, double-buffered
        if rows * bs * LANES * 4 <= budget:
            return bs
    return 1


def _to_tiles(a: np.ndarray, NB: int, BS: int, inner: tuple[int, ...]):
    """(B, *inner) → (NB, BS, 128, *inner) problem-tile layout, flattened
    so that problem b sits at (b//BT, (b%BT)//128, b%128)."""
    B = a.shape[0]
    pad = NB * BS * LANES - B
    if pad:
        a = np.concatenate([a, np.zeros((pad, *a.shape[1:]), a.dtype)], 0)
    return a.reshape(NB, BS, LANES, *inner)


def _seq_operand(a4):
    # (NB, BS, 128, L) → (NB*L, BS, 128) so each column is one block row
    NB, BS, _, L = a4.shape
    return jnp.transpose(jnp.asarray(a4), (0, 3, 1, 2)).reshape(NB * L, BS, LANES)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "with_planes", "dtype", "interpret", "del_", "ext",
        "packed_lut", "lut_bits", "lut_bias", "dense",
        "track_argmax", "with_scores_plane",
    ),
)
def _run(
    q4,  # (NB*C, BS, 128) i32 or None-like placeholder
    t4,  # (NB*R, BS, 128) i32
    qlen4,  # (NB, BS, 128) i32
    tlen4,  # (NB, BS, 128) i32
    mat,  # (V, V) | (NB*V*V, BS, 128) | (V, W) | (NB*V*W, BS, 128)
    del_,
    ext,
    *,
    mode: str,
    with_planes: bool,
    dtype,
    interpret: bool,
    packed_lut: bool = False,
    lut_bits: int = 8,
    lut_bias: int = 0,
    dense: bool = False,
    track_argmax: bool = True,
    with_scores_plane: bool = False,
):
    BS = t4.shape[1]
    NB = tlen4.shape[0]
    R = t4.shape[0] // NB
    batched_mat = mat.ndim == 3
    if mode == "pwm":
        V = 4
        C = (mat.shape[0] // (NB * V)) if batched_mat else mat.shape[1]
    else:
        V = mat.shape[-1] if not batched_mat else int(round(np.sqrt(mat.shape[0] // NB)))
        C = q4.shape[0] // NB
    if packed_lut:
        # pre-pack the (V, V) int32 matrix by columns: word g of column
        # j holds the biased bytes mat[4g..4g+3, j] (8-bit path), or the
        # 8 biased nibbles mat[8g..8g+7, j] - lut_bias (4-bit path, for
        # matrices whose entry range fits 16 values).  int32 shifts
        # wrap, matching the kernel's arithmetic-shift + mask extraction.
        rows = []
        if lut_bits == 4:
            for g in range(_cdiv(V, 8)):
                w = jnp.zeros((mat.shape[1],), jnp.int32)
                for k in range(8):
                    v = 8 * g + k
                    if v < V:
                        w = w + ((mat[v] - lut_bias) << (4 * k))
                rows.append(w)
        else:
            for g in range(_cdiv(V, 4)):
                w = jnp.zeros((mat.shape[1],), jnp.int32)
                for k in range(4):
                    v = 4 * g + k
                    if v < V:
                        w = w + ((mat[v] + 128) << (8 * k))
                rows.append(w)
        mat = jnp.stack(rows)  # (n_words, V)

    grid = (NB, C)
    in_specs = []
    operands = []
    if mode != "pwm":
        in_specs.append(
            pl.BlockSpec((1, BS, LANES), lambda i, x: (i * C + x, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(q4)
    in_specs.append(
        pl.BlockSpec((R, BS, LANES), lambda i, x: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    operands.append(t4)
    if mode != "pwm":
        in_specs.append(
            pl.BlockSpec((1, BS, LANES), lambda i, x: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(qlen4)
    in_specs.append(
        pl.BlockSpec((1, BS, LANES), lambda i, x: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    operands.append(tlen4)
    if batched_mat:
        VV = mat.shape[0] // NB
        in_specs.append(
            pl.BlockSpec((VV, BS, LANES), lambda i, x: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    else:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    operands.append(mat)

    small = lambda: pl.BlockSpec(  # noqa: E731
        (1, BS, LANES), lambda i, x: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = [
        jax.ShapeDtypeStruct((NB, BS, LANES), dtype),  # fmax
        jax.ShapeDtypeStruct((NB, BS, LANES), jnp.int32),  # fy
        jax.ShapeDtypeStruct((NB, BS, LANES), jnp.int32),  # fx
        jax.ShapeDtypeStruct((NB, BS, LANES), dtype),  # end
    ]
    out_specs = [small(), small(), small(), small()]
    plane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (1, rows, BS, LANES), lambda i, x: (i * C + x, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if with_planes:
        # packed: 8 direction codes (2 bits each) per int32 word
        out_shapes.append(
            jax.ShapeDtypeStruct((NB * C, R // 8, BS, LANES), jnp.int32)
        )
        out_specs.append(plane_spec(R // 8))
    if with_scores_plane:
        out_shapes.append(jax.ShapeDtypeStruct((NB * C, R, BS, LANES), dtype))
        out_specs.append(plane_spec(R))

    scratch = [
        pltpu.VMEM((R + 1, BS, LANES), dtype),  # colbuf (in-place)
        pltpu.VMEM((BS, LANES), dtype),  # pen
    ]

    kernel = functools.partial(
        _wrapped_kernel,
        C=C, R=R, V=V, BS=BS, mode=mode, batched_mat=batched_mat,
        packed_lut=packed_lut, lut_bits=lut_bits, lut_bias=lut_bias,
        dense=dense, track_argmax=track_argmax,
        with_planes=with_planes, with_scores_plane=with_scores_plane,
        del_=float(del_), ext=float(ext), dtype=dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*operands)


def _wrapped_kernel(*refs, **kw):
    _kernel(refs, **kw)


def _unpack_words_pm(w: np.ndarray, R: int, C: int) -> np.ndarray:
    """Problem-major packed words (B, R//8, C) int32 → (B, R, C) uint8
    direction codes.  Each packed word uses its low 2 bytes (8 codes × 2
    bits); LUT256 maps a byte to its 4 codes in one gather."""
    B = w.shape[0]
    w8 = np.ascontiguousarray(w).view(np.uint8).reshape(B, R // 8, C, 4)[..., :2]
    d = _UNPACK_LUT[w8]  # (B, R//8, C, 2, 4) u8
    return np.transpose(d, (0, 1, 3, 4, 2)).reshape(B, R, C)


def dirs_from_packed(w: np.ndarray, qlen, tlen, mode: str) -> np.ndarray:
    """Problem-major packed direction words → (B, R+1, C+1) uint8 planes
    with the reference border directions (simple/mod.rs:61,66)."""
    B, R8, C = w.shape
    R = R8 * 8
    d = _unpack_words_pm(w, R, C)
    qlen = np.asarray(qlen)
    tlen = np.asarray(tlen)
    dirs = np.full((B, R + 1, C + 1), np.uint8(BEG))
    if mode == "global":
        xs = np.arange(1, C + 1, dtype=np.int32)
        ys = np.arange(1, R + 1, dtype=np.int32)
        dirs[:, 0, 1:] = np.where(
            xs[None, :] <= qlen[:, None], np.uint8(LEFT), np.uint8(BEG)
        )
        dirs[:, 1:, 0] = np.where(
            ys[None, :] <= tlen[:, None], np.uint8(TOP), np.uint8(BEG)
        )
    dirs[:, 1:, 1:] = d
    return dirs


def _transpose_words_pm(w, NB, BS, C, R):
    """Device-side: (NB*C, R//8, BS, LANES) column-major word stream →
    (NB*BS*LANES, R//8, C) problem-major (cheap on device; the host then
    moves only 2 bits per cell)."""
    w = w.reshape(NB, C, R // 8, BS, LANES)
    return jnp.transpose(w, (0, 3, 4, 2, 1)).reshape(NB * BS * LANES, R // 8, C)


# module-level jitted forms: a fresh jax.jit(...) wrapper (or closure)
# per call would carry its OWN trace cache and recompile the transpose
# on EVERY planes fill (~60s each on a remote-compile backend)
_transpose_words_pm_jit = jax.jit(
    _transpose_words_pm, static_argnums=(1, 2, 3, 4)
)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _transpose_vals_pm(v, NB, BS, C, R):
    v = v.reshape(NB, C, R, BS, LANES)
    return jnp.transpose(v, (0, 3, 4, 2, 1)).reshape(NB * BS * LANES, R, C)


def _assemble(interior_vals, interior_dirs, NB, BS, B, R, C, qlen, tlen, mode, del_):
    """Packed direction/score streams → (B, R+1, C+1) planes with borders.

    The device transposes the packed words to problem-major order (cheap);
    the device→host transfer then moves 2 bits per cell, and the unpack +
    border assembly happen in NumPy on the host (the consumers — traceback
    walks — are host-side anyway).  ``interior_vals`` may be None
    (direction-only mode; returns plane=None)."""
    w = np.asarray(_transpose_words_pm_jit(interior_dirs, NB, BS, C, R))[:B]
    qlen = np.asarray(qlen)
    tlen = np.asarray(tlen)
    dirs = dirs_from_packed(w, qlen, tlen, mode)
    plane = None
    if interior_vals is not None:
        v = np.asarray(_transpose_vals_pm(interior_vals, NB, BS, C, R))[:B]
        plane = np.zeros((B, R + 1, C + 1), np.asarray(v).dtype)
        if mode == "global":
            xs = np.arange(1, C + 1, dtype=np.int32)
            ys = np.arange(1, R + 1, dtype=np.int32)
            fdt = plane.dtype
            qlf = qlen.astype(fdt)[:, None]
            tlf = tlen.astype(fdt)[:, None]
            plane[:, 0, 1:] = np.where(
                xs[None, :] == qlen[:, None],
                -(qlf + 1) * del_, -xs[None, :].astype(fdt) * del_,
            )
            plane[:, 1:, 0] = np.where(
                ys[None, :] == tlen[:, None],
                -(tlf + 1) * del_, -ys[None, :].astype(fdt) * del_,
            )
        plane[:, 1:, 1:] = v
    return plane, dirs


def fill_batch_pallas(
    q,
    qlen,
    t,
    tlen,
    matrix,
    del_,
    ext,
    *,
    mode: str = "local",
    with_planes: bool = True,
    dtype=jnp.float32,
    track_argmax: bool = True,
    scores_plane: bool = True,
) -> FillResult:
    """Drop-in Pallas counterpart of scan_engine.fill_batch.

    ``track_argmax=False`` skips per-cell argmax/end bookkeeping (fy/fx/
    end come back zero; fmax is still exact) — for consumers that only
    need scores, like the p-value statistics.
    """
    if mode not in ("local", "global"):
        raise ValueError(f"mode must be local|global, got {mode!r}")
    q = np.asarray(q, np.int32)
    t = np.asarray(t, np.int32)
    qlen = np.asarray(qlen, np.int32)
    tlen = np.asarray(tlen, np.int32)
    matrix = np.asarray(matrix)
    B, C = q.shape
    R_orig = t.shape[1]
    R = R_orig
    if R % 8:  # kernel unrolls the row loop by 8
        t = np.pad(t, ((0, 0), (0, 8 - R % 8)))
        R = t.shape[1]
    batched_mat = matrix.ndim == 3
    V = matrix.shape[-1]
    BS = min(
        _pick_bs(R, C, V, with_planes, batched_mat, scores_plane),
        max(1, _cdiv(B, LANES)),
    )
    NB = _cdiv(B, BS * LANES)

    q4 = _seq_operand(_to_tiles(q, NB, BS, (C,)))
    t4 = _seq_operand(_to_tiles(t, NB, BS, (R,)))
    # length 0 for padding problems → fully inactive
    qlen4 = jnp.asarray(_to_tiles(qlen, NB, BS, ()))
    tlen4 = jnp.asarray(_to_tiles(tlen, NB, BS, ()))
    if batched_mat:
        m4 = _seq_operand(_to_tiles(matrix.reshape(B, V * V), NB, BS, (V * V,)))
        m4 = m4.astype(dtype)
        packed_lut, lut_bits, lut_bias = False, 8, 0
    else:
        # integral entries within int8 range → packed-LUT fast path
        m4, packed_lut, lut_bits, lut_bias = lut_matrix_arg(matrix, dtype)

    # dense: no padding anywhere (every slot a full-size problem)
    dense = bool(
        B == NB * BS * LANES
        and np.all(qlen == C)
        and np.all(tlen == R)
    )
    interpret = not on_tpu()
    outs = _run(
        q4, t4, qlen4, tlen4, m4, float(del_), float(ext),
        mode=mode, with_planes=with_planes, dtype=dtype, interpret=interpret,
        packed_lut=packed_lut, lut_bits=lut_bits, lut_bias=lut_bias,
        dense=dense, track_argmax=track_argmax,
        with_scores_plane=scores_plane and with_planes,
    )
    fmax, fy, fx, end = [o.reshape(NB * BS * LANES)[:B] for o in outs[:4]]
    plane = dirs = None
    if with_planes:
        plane, dirs = _assemble(
            outs[5] if scores_plane else None, outs[4], NB, BS, B, R, C,
            jnp.asarray(qlen), jnp.asarray(tlen), mode, float(del_),
        )
        if R != R_orig:  # drop the unroll padding rows
            if plane is not None:
                plane = plane[:, : R_orig + 1]
            dirs = dirs[:, : R_orig + 1]
    return FillResult(plane=plane, dirs=dirs, fmax=fmax, fy=fy, fx=fx, end=end)


def fill_pwm_batch_pallas(
    q,
    qlen,
    pwm,
    del_,
    ext,
    *,
    with_planes: bool = True,
    dtype=jnp.float32,
    scores_plane: bool = True,
    track_argmax: bool = True,
) -> FillResult:
    """Drop-in Pallas counterpart of scan_engine.fill_pwm_batch.

    Plane dims (qlen+1, W+1): rows are query positions (pwm/mod.rs:44-74).
    ``track_argmax=False`` (scores-only consumers like the window-scan
    z-filter) skips the per-cell argmax/end bookkeeping — fy/fx/end
    come back zero, fmax stays exact.
    """
    q = np.asarray(q, np.int32)
    qlen = np.asarray(qlen, np.int32)
    pwm = np.asarray(pwm)
    B, R_orig = q.shape
    R = R_orig
    if R % 8:  # kernel unrolls the row loop by 8
        q = np.pad(q, ((0, 0), (0, 8 - R % 8)))
        R = q.shape[1]
    batched_mat = pwm.ndim == 3
    W = pwm.shape[-1]
    BS = min(
        _pick_bs(R, W, 4, with_planes, batched_mat, scores_plane,
                 mat_rows=4 * W),
        max(1, _cdiv(B, LANES)),
    )
    NB = _cdiv(B, BS * LANES)

    t4 = _seq_operand(_to_tiles(q, NB, BS, (R,)))
    tlen4 = jnp.asarray(_to_tiles(qlen, NB, BS, ()))
    if batched_mat:
        m4 = _seq_operand(_to_tiles(pwm.reshape(B, 4 * W), NB, BS, (4 * W,)))
        m4 = m4.astype(dtype)
    else:
        m4 = jnp.asarray(pwm, dtype)

    interpret = not on_tpu()
    outs = _run(
        None, t4, None, tlen4, m4, float(del_), float(ext),
        mode="pwm", with_planes=with_planes, dtype=dtype, interpret=interpret,
        with_scores_plane=scores_plane and with_planes,
        track_argmax=track_argmax or with_planes,
    )
    fmax, fy, fx, end = [o.reshape(NB * BS * LANES)[:B] for o in outs[:4]]
    plane = dirs = None
    if with_planes:
        plane, dirs = _assemble(
            outs[5] if scores_plane else None, outs[4], NB, BS, B, R, W,
            jnp.full(B, W, jnp.int32), jnp.asarray(qlen), "local", float(del_),
        )
        if R != R_orig:  # drop the unroll padding rows
            if plane is not None:
                plane = plane[:, : R_orig + 1]
            dirs = dirs[:, : R_orig + 1]
    return FillResult(plane=plane, dirs=dirs, fmax=fmax, fy=fy, fx=fx, end=end)


def _to_tiles_traced(a, NB: int, BS: int):
    """jnp version of _to_tiles for use under jit/shard_map: (B, L) →
    (NB*L, BS, 128) sequence-operand layout (or (NB, BS, 128) for 1-D)."""
    B = a.shape[0]
    pad = NB * BS * LANES - B
    if a.ndim == 1:
        a = jnp.pad(a, (0, pad))
        return a.reshape(NB, BS, LANES)
    L = a.shape[1]
    a = jnp.pad(a, ((0, pad), (0, 0)))
    a = a.reshape(NB, BS, LANES, L)
    return jnp.transpose(a, (0, 3, 1, 2)).reshape(NB * L, BS, LANES)


def fill_scores_traced(
    q,
    qlen,
    t,
    tlen,
    matrix,
    del_: float,
    ext: float,
    *,
    mode: str = "local",
    dtype=jnp.float32,
    packed_lut: bool = False,
    lut_bits: int = 8,
    lut_bias: int = 0,
    bs: int | None = None,
    interpret: bool | None = None,
    track_argmax: bool = True,
):
    """Scores-only pallas fill, fully traceable (no host numpy) — for use
    inside jit/shard_map, one kernel per device shard.

    ``packed_lut`` (and the 4-bit ``lut_bits``/``lut_bias`` variant, see
    :func:`lut_params`) must be decided by the caller from the concrete
    matrix (it is traced here, so its values cannot be inspected); pass
    an int32 matrix with it.  ``matrix`` may be (V, V) shared or
    (B, V, V) per-problem.  Returns (fmax, fy, fx, end) of shape (B,).
    """
    # the kernel captures the global end score H[tlen,qlen] inside the
    # argmax machinery — honoring track_argmax=False in global mode
    # would return end=0 here but real scores on the XLA engine, a
    # silent cross-engine divergence (CLAUDE.md exactness invariant);
    # force tracking in the wrapper so no caller can trip it
    track_argmax = track_argmax or mode == "global"
    q = jnp.asarray(q, jnp.int32)
    t = jnp.asarray(t, jnp.int32)
    B, C = q.shape
    R = t.shape[1]
    if R % 8:
        t = jnp.pad(t, ((0, 0), (0, 8 - R % 8)))
        R = t.shape[1]
    V = matrix.shape[-1]
    batched_mat = matrix.ndim == 3
    BS = bs or min(
        _pick_bs(R, C, V, False, batched_mat), max(1, _cdiv(B, LANES))
    )
    NB = _cdiv(B, BS * LANES)
    q4 = _to_tiles_traced(q, NB, BS)
    t4 = _to_tiles_traced(t, NB, BS)
    ql4 = _to_tiles_traced(jnp.asarray(qlen, jnp.int32), NB, BS)
    tl4 = _to_tiles_traced(jnp.asarray(tlen, jnp.int32), NB, BS)
    if batched_mat:
        matrix = _to_tiles_traced(
            jnp.asarray(matrix, dtype).reshape(B, V * V), NB, BS
        )
    if interpret is None:
        interpret = not on_tpu()
    outs = _run(
        q4, t4, ql4, tl4, matrix, float(del_), float(ext),
        mode=mode, with_planes=False, dtype=dtype, interpret=interpret,
        packed_lut=packed_lut, lut_bits=lut_bits, lut_bias=lut_bias,
        track_argmax=track_argmax,
    )
    return tuple(o.reshape(NB * BS * LANES)[:B] for o in outs[:4])


def fill_full_traced(
    q,
    qlen,
    t,
    tlen,
    matrix,
    del_: float,
    ext: float,
    *,
    mode: str = "local",
    dtype=jnp.float32,
    packed_lut: bool = False,
    lut_bits: int = 8,
    lut_bias: int = 0,
    bs: int | None = None,
    interpret: bool | None = None,
):
    """Full-mode (direction-plane) pallas fill, fully traceable — for
    jit/shard_map.  Returns (fmax, fy, fx, end, words) where ``words`` is
    the problem-major 2-bit-packed direction stream (B, R8//8, C) int32
    with R8 = R rounded up to 8; unpack host-side with
    :func:`dirs_from_packed`.  ``matrix`` may be (V, V) or (B, V, V).
    """
    q = jnp.asarray(q, jnp.int32)
    t = jnp.asarray(t, jnp.int32)
    B, C = q.shape
    R = t.shape[1]
    if R % 8:
        t = jnp.pad(t, ((0, 0), (0, 8 - R % 8)))
        R = t.shape[1]
    V = matrix.shape[-1]
    batched_mat = matrix.ndim == 3
    BS = bs or min(
        _pick_bs(R, C, V, True, batched_mat, scores_plane=False),
        max(1, _cdiv(B, LANES)),
    )
    NB = _cdiv(B, BS * LANES)
    q4 = _to_tiles_traced(q, NB, BS)
    t4 = _to_tiles_traced(t, NB, BS)
    ql4 = _to_tiles_traced(jnp.asarray(qlen, jnp.int32), NB, BS)
    tl4 = _to_tiles_traced(jnp.asarray(tlen, jnp.int32), NB, BS)
    if batched_mat:
        matrix = _to_tiles_traced(
            jnp.asarray(matrix, dtype).reshape(B, V * V), NB, BS
        )
    if interpret is None:
        interpret = not on_tpu()
    outs = _run(
        q4, t4, ql4, tl4, matrix, float(del_), float(ext),
        mode=mode, with_planes=True, dtype=dtype, interpret=interpret,
        packed_lut=packed_lut, lut_bits=lut_bits, lut_bias=lut_bias,
        with_scores_plane=False,
    )
    fmax, fy, fx, end = (o.reshape(NB * BS * LANES)[:B] for o in outs[:4])
    # the module-level jitted transpose: eager would dispatch 3 separate
    # ops per fill (and pay a fresh compile on the uncached axon
    # backend); under an outer jit the call inlines into the trace
    words = _transpose_words_pm_jit(outs[4], NB, BS, C, R)[:B]
    return fmax, fy, fx, end, words


def fill_pwm_full_traced(
    q,
    qlen,
    pwm,
    del_: float,
    ext: float,
    *,
    dtype=jnp.float32,
    bs: int | None = None,
    interpret: bool | None = None,
):
    """Traceable full-mode PWM fill (shared or (B, 4, W) batched PWM) —
    returns (fmax, fy, fx, end, words) like :func:`fill_full_traced`
    with plane dims (qlen+1, W+1)."""
    q = jnp.asarray(q, jnp.int32)
    B, R = q.shape
    if R % 8:
        q = jnp.pad(q, ((0, 0), (0, 8 - R % 8)))
        R = q.shape[1]
    W = pwm.shape[-1]
    batched_mat = pwm.ndim == 3
    BS = bs or min(
        _pick_bs(R, W, 4, True, batched_mat, scores_plane=False,
                 mat_rows=4 * W),
        max(1, _cdiv(B, LANES)),
    )
    NB = _cdiv(B, BS * LANES)
    t4 = _to_tiles_traced(q, NB, BS)
    tl4 = _to_tiles_traced(jnp.asarray(qlen, jnp.int32), NB, BS)
    if batched_mat:
        pwm = _to_tiles_traced(jnp.asarray(pwm, dtype).reshape(B, 4 * W), NB, BS)
    else:
        pwm = jnp.asarray(pwm, dtype)
    if interpret is None:
        interpret = not on_tpu()
    outs = _run(
        None, t4, None, tl4, pwm, float(del_), float(ext),
        mode="pwm", with_planes=True, dtype=dtype, interpret=interpret,
        with_scores_plane=False,
    )
    fmax, fy, fx, end = (o.reshape(NB * BS * LANES)[:B] for o in outs[:4])
    words = _transpose_words_pm_jit(outs[4], NB, BS, W, R)[:B]
    return fmax, fy, fx, end, words


def fill_pwm_scores_traced(
    q,
    qlen,
    pwm,
    del_: float,
    ext: float,
    *,
    dtype=jnp.float32,
    bs: int | None = None,
    interpret: bool | None = None,
    track_argmax: bool = True,
):
    """Traceable scores-only PWM fill (shared or (B, 4, W) batched PWM)
    for jit/shard_map.  (No ``packed_lut`` option: the kernel's packed
    path reads the pair-mode query codes, which PWM mode does not
    have.)  ``track_argmax=False``: fy/fx/end come back zero."""
    q = jnp.asarray(q, jnp.int32)
    B, R = q.shape
    if R % 8:
        q = jnp.pad(q, ((0, 0), (0, 8 - R % 8)))
        R = q.shape[1]
    W = pwm.shape[-1]
    batched_mat = pwm.ndim == 3
    BS = bs or min(
        _pick_bs(R, W, 4, False, batched_mat, mat_rows=4 * W),
        max(1, _cdiv(B, LANES))
    )
    NB = _cdiv(B, BS * LANES)
    t4 = _to_tiles_traced(q, NB, BS)
    tl4 = _to_tiles_traced(jnp.asarray(qlen, jnp.int32), NB, BS)
    if batched_mat:
        pwm = _to_tiles_traced(jnp.asarray(pwm, dtype).reshape(B, 4 * W), NB, BS)
    if interpret is None:
        interpret = not on_tpu()
    outs = _run(
        None, t4, None, tl4, pwm, float(del_), float(ext),
        mode="pwm", with_planes=False, dtype=dtype, interpret=interpret,
        packed_lut=False, track_argmax=track_argmax,
    )
    return tuple(o.reshape(NB * BS * LANES)[:B] for o in outs[:4])
