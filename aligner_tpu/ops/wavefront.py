"""Single-pair global-alignment row-scan kernel (huge pairs on device).

The batched engines parallelize over *problems*; a single chromosome-
scale pair has no batch axis, and its local-mode fill is inherently
sequential (the del/ext penalty state chains cell to cell, SURVEY.md
§2.3.3).  In **global** mode, however, the survey's closed form holds:
``get_direction`` never returns Beginning (enums.rs:18-28), so the
penalty is ``del`` for cell (1,1) only and ``ext`` everywhere else
(simple/mod.rs:72,88-92).  That makes the recurrence

    H[y,x] = max(H[y-1,x-1] + s, H[y-1,x] - ext, H[y,x-1] - ext)

a plain linear-gap DP whose *row* can be computed in parallel: with
``M[x] = max(H[y-1,x-1] + s[x], H[y-1,x] - ext)`` (vertical/diagonal
terms only), the horizontal chain is a max-prefix-scan,

    H[y,x] = max_{j<=x} (M'[j] - (x-j)*ext)
           = prefix_max(M' + j*ext)[x] - x*ext,

computed in log2(C) vector steps.  Cell (1,1) (and the left border fold)
is patched into ``M'`` before the scan, so the result is cell-for-cell
identical to the reference fill — directions are then re-derived from
the finished values with the exact tie policy (top > left > diagonal).

Arithmetic is **int32** (requires an integral matrix and integral
del/ext — the BLOSUM paths; |H| must stay < 2^30), which makes the fill
bit-exact against the float64 oracle.  Directions stream to HBM packed
16 rows per int32 word (2 bits/cell); scores-only mode writes nothing.

Layout: a row of C cells lives in one (S, 128) register tile
(S = ceil(C/128) sublanes); the grid walks row-blocks of TR rows, with
the previous row carried in VMEM scratch.  Width is VMEM-bound at
roughly C <= 256k (the packed score-word table is 24C bytes); length R
is unbounded.  Cites: simple/mod.rs:42-144 (global fill + borders),
enums.rs:18-28 (tie policy).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..backend import on_tpu
from .scan_engine import BEG, DIAG, LEFT, TOP

LANES = 128


def _cdiv(a, b):
    return -(-a // b)


def pack_matrix_words(matrix: np.ndarray) -> np.ndarray:
    """Column-packed score words: out[g, j] holds the 4 biased bytes
    matrix[4g..4g+3, j] in one int32 (the layout every wavefront kernel
    and pallas_dp's packed-LUT path consume; pallas_dp._run re-derives
    the same layout with traced jnp ops — tests pin their agreement).
    Entries must fit a biased byte (|m| <= 127) — enforced, because an
    overflowing byte silently corrupts neighboring scores."""
    mi = np.round(np.asarray(matrix)).astype(np.int64)
    if np.abs(mi).max(initial=0) > 127:
        raise ValueError("pack_matrix_words requires |entries| <= 127")
    V = mi.shape[0]
    n_words = _cdiv(V, 4)
    pmat = np.zeros((n_words, mi.shape[1]), np.int64)
    for g in range(n_words):
        for k in range(4):
            v = 4 * g + k
            if v < V:
                pmat[g] += (mi[v] + 128) << (8 * k)
    return (
        (pmat & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
        .reshape(n_words, mi.shape[1])
    )


def _flat_shift_right(x, fill, S):
    """Flattened shift by one: out[j] = x[j-1], out[0] = fill, where j is
    the row-major (sublane, lane) index of an (S, 128) tile."""
    sub = lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    rolled = pltpu.roll(x, shift=1, axis=1)  # lane 0 <- lane 127 (same sublane)
    carry = pltpu.roll(rolled, shift=1, axis=0)  # previous sublane's lane 127
    out = jnp.where(lane == 0, carry, rolled)
    return jnp.where((lane == 0) & (sub == 0), fill, out)


def _prefix_max_flat(x, S):
    """Inclusive max-prefix-scan over the flattened (S, 128) tile.

    Two-level: a lane scan inside each 128-wide chunk, then a sublane
    scan of the chunk maxima.  (Measured alternatives on v5e: running
    the chunk scan on a (1, S) transpose of the maxima column, or
    replacing the dynamic packed-word read with slab selects, were both
    SLOWER — Mosaic transposes/relayouts cost more than the log2(S)
    sublane-roll steps they save.)"""
    lane = lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    k = 1
    while k < LANES:
        sh = pltpu.roll(x, shift=k, axis=1)
        x = jnp.where(lane >= k, jnp.maximum(x, sh), x)
        k *= 2
    if S > 1:
        sub = lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
        # chunk totals live in lane 127; scan them across sublanes
        tot = jnp.broadcast_to(x[:, LANES - 1 :], (S, LANES))
        k = 1
        while k < S:
            sh = pltpu.roll(tot, shift=k, axis=0)
            tot = jnp.where(sub >= k, jnp.maximum(tot, sh), tot)
            k *= 2
        excl = pltpu.roll(tot, shift=1, axis=0)  # exclusive: previous chunks
        x = jnp.where(sub > 0, jnp.maximum(x, excl), x)
    return x


ROWS_PER_WORD = 16  # 2-bit direction codes packed along the row axis


def _kernel(
    q_ref,  # (S, 128) i32 query codes (VMEM), padded with V
    t_ref,  # (1, 1, TR) i32 target codes for this row block (SMEM)
    pmat_ref,  # (n_words, V) i32 column-packed matrix (SMEM)
    h0_ref,  # (S, 128) i32 initial H row (used when y_offset > 0)
    scal_ref,  # (1, 3) i32 (SMEM): [y_offset, C_real, R_real] — ALL
    # traced so one compiled program serves every fill whose *padded*
    # bucket (S sublanes, n_blocks of TR rows) matches: the chunked
    # traceback replays every block with it, and distinct pair lengths
    # within a bucket stop costing a fresh ~60 s remote compile each on
    # this machine's tunnel (the per-step SMEM-read ablation in
    # docs/PERF_NOTES.md showed scalar reads are free at these sizes)
    end_ref,  # (1, 1) i32 out (SMEM): H[tlen, qlen]
    *refs,
    S: int,
    TR: int,
    V: int,
    del_: int,
    ext: int,
    with_dirs: bool,
    ckpt_every: int,
):
    if with_dirs:
        dirs_ref = refs[0]
        refs = refs[1:]
    if ckpt_every:
        ckpt_ref = refs[0]
        refs = refs[1:]
    h_ref, pw_ref, xp_ref = refs
    i = pl.program_id(0)
    n_words = _cdiv(V, 4)
    P = jnp.int32(ext)
    DEL = jnp.int32(del_)
    sub = lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    flat = sub * LANES + lane  # j = x - 1

    y_offset = scal_ref[0, 0]
    C_real = scal_ref[0, 1]
    R_real = scal_ref[0, 2]

    @pl.when(i == 0)
    def _init():
        x1 = flat + 1
        # y_offset == 0: the global border row (simple/mod.rs:59-70);
        # otherwise a mid-fill replay from a checkpointed H[y_offset]
        border_row = jnp.where(
            x1 == C_real, -(C_real + 1) * DEL, -x1 * DEL
        )
        h_ref[:] = jnp.where(y_offset == 0, border_row, h0_ref[:])
        # packed score words by query symbol: pw[g][x] = the 4 biased
        # bytes mat[4g..4g+3, q[x]] (built once; V² work amortized over R)
        qx = q_ref[:]
        for g in range(n_words):
            w = jnp.zeros((S, LANES), jnp.int32)
            for v in range(V):
                w = w + pmat_ref[g, v] * (qx == v).astype(jnp.int32)
            pw_ref[g] = w
        xp_ref[:] = x1 * P

    xp = xp_ref[:]

    def border(y):
        # H[y, 0] = -y*del, far corner H[tlen, 0] = -(tlen+1)*del
        return jnp.where(y == R_real, -(R_real + 1) * DEL, -y * DEL)

    def row(r, word):
        y = y_offset + i * TR + r + 1  # 1-based absolute row
        ty = t_ref[0, 0, r]
        w = pw_ref[ty >> 2]
        srow = ((w >> ((ty & 3) * 8)) & 255) - 128
        prev = h_ref[:]
        bprev = border(y - 1)
        bcur = border(y)
        diag = _flat_shift_right(prev, bprev, S)
        dv = diag + srow
        m0 = jnp.maximum(dv, prev - P)
        first = flat == 0  # x == 1
        # fold the left border into x=1; cell (1,1) is the only cell
        # whose penalty is del (the very first cell in fill order)
        is_row1 = y == 1
        pen1 = jnp.where(is_row1, DEL, P)
        a = jnp.where(
            first,
            jnp.maximum(
                jnp.where(is_row1, jnp.maximum(dv, prev - pen1), m0),
                bcur - pen1,
            ),
            m0,
        )
        t_ = a + xp
        h = _prefix_max_flat(t_, S) - xp
        h_ref[:] = h
        @pl.when(y == R_real)
        def _end():
            # one-hot masked reduction (same scheme as _kernel_block_cs):
            # C_real is traced, so a direct [j0//128, j0%128] read would
            # be a dynamic per-lane access — not a vector op
            end_ref[0, 0] = jnp.sum(jnp.where(flat == C_real - 1, h, 0))
        if with_dirs:
            pen_d = jnp.where(is_row1 & first, DEL, P)
            top = prev - pen_d
            leftv = _flat_shift_right(h, bcur, S) - pen_d
            # exact tie policy on integers: m - v < eps  <=>  m <= v
            d = jnp.where(
                h <= top,
                jnp.int32(TOP),
                jnp.where(h <= leftv, jnp.int32(LEFT), jnp.int32(DIAG)),
            )
            word = word | (d << (2 * (r % ROWS_PER_WORD)))
            @pl.when(r % ROWS_PER_WORD == ROWS_PER_WORD - 1)
            def _store():
                dirs_ref[r // ROWS_PER_WORD] = word
            word = jnp.where(r % ROWS_PER_WORD == ROWS_PER_WORD - 1, 0, word)
        return word

    lax.fori_loop(0, TR, row, jnp.zeros((S, LANES), jnp.int32))
    if ckpt_every:
        # last writer within each ckpt window leaves H[(k+1)*ckpt_every]
        ckpt_ref[0] = h_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "TR", "V", "del_", "ext", "with_dirs",
        "interpret", "ckpt_every",
    ),
)
def _run(
    q_tile,  # (S, 128) i32
    t_blocks,  # (n_blocks, 1, TR) i32
    pmat,  # (n_words, V) i32
    h0,  # (S, 128) i32 initial row (zeros when y_offset == 0)
    y_offset=0,  # scalar i32: absolute row offset (traced — see _kernel)
    *,
    S: int,
    TR: int,
    V: int,
    C_real,  # TRACED real pair lengths — one compile per padded bucket
    R_real,  # (S×128 columns, n_blocks×TR rows), see _kernel's scal_ref
    del_: int,
    ext: int,
    with_dirs: bool,
    interpret: bool,
    ckpt_every: int = 0,
):
    n_blocks = t_blocks.shape[0]
    kernel = functools.partial(
        _kernel,
        S=S, TR=TR, V=V,
        del_=del_, ext=ext, with_dirs=with_dirs,
        ckpt_every=ckpt_every,
    )
    in_specs = [
        pl.BlockSpec((S, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, TR), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((S, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_shapes = [jax.ShapeDtypeStruct((1, 1), jnp.int32)]
    out_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    ]
    if with_dirs:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (n_blocks * (TR // ROWS_PER_WORD), S, LANES), jnp.int32
            )
        )
        out_specs.append(
            pl.BlockSpec(
                (TR // ROWS_PER_WORD, S, LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    if ckpt_every:
        assert ckpt_every % TR == 0
        n_ck = _cdiv(n_blocks * TR, ckpt_every)
        out_shapes.append(
            jax.ShapeDtypeStruct((n_ck, S, LANES), jnp.int32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, S, LANES),
                lambda i: ((i * TR) // ckpt_every, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    n_words = _cdiv(V, 4)
    scratch = [
        pltpu.VMEM((S, LANES), jnp.int32),  # carried previous row
        pltpu.VMEM((n_words, S, LANES), jnp.int32),  # packed score words
        pltpu.VMEM((S, LANES), jnp.int32),  # (x)*ext offsets
    ]
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(q_tile, t_blocks, pmat, h0,
      jnp.stack([
          jnp.asarray(y_offset, jnp.int32),
          jnp.asarray(C_real, jnp.int32),
          jnp.asarray(R_real, jnp.int32),
      ]).reshape(1, 3))


def _integral_int8(matrix, del_, ext) -> bool:
    m = np.asarray(matrix)
    return bool(
        np.all(m == np.round(m))
        and np.abs(m).max() <= 127
        and float(del_) == int(del_)
        and float(ext) == int(ext)
    )


MAX_WIDTH = 256 * 1024  # VMEM bound: packed words are 24C bytes
# above this many cells align_global switches from a materialized
# direction plane to checkpoint-and-replay traceback (2-bit words of a
# direct plane at this size ≈ 16 MB host-side)
DIRECT_PLANE_CELLS = 1 << 26


def range_ok(qlen: int, tlen: int, del_, ext) -> bool:
    """int32-exactness guard: the kernel's arithmetic must stay well
    inside int32.  |H| is bounded by the deeper of the gap ramp
    (-(R+C+2)·max(del,ext) along the borders) and the match ramp
    (min(R,C)·127 down the diagonal); the row-scan's prefix terms
    a + x·ext add (C+1)·ext + del, and the band engines' hat
    coordinates ĥ = h + d·ext add up to (C_pad + TB)·ext ≤
    (C + R + 2·128)·ext (band step d never exceeds the padded width
    plus band height).  Beyond this (≈97M rows at del=11) scores
    silently wrap — refuse instead (ADVICE r2)."""
    pen = max(int(del_), int(ext), 1)
    h_abs = max((qlen + tlen + 2) * pen, min(qlen, tlen) * 127)
    slack = (qlen + tlen + 2 * LANES + 2) * max(int(ext), 1) + int(del_)
    return h_abs + slack < 2**30


def supported(qlen: int, matrix, del_, ext, tlen: int | None = None) -> bool:
    return (
        qlen <= MAX_WIDTH
        and _integral_int8(matrix, del_, ext)
        and (tlen is None or range_ok(qlen, tlen, del_, ext))
    )


def _scoped_vmem_kib() -> int:
    """The libtpu scoped-VMEM limit in KiB (default 16 MiB unless raised
    via ``LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=N``)."""
    import re

    m = re.search(r"--xla_tpu_scoped_vmem_limit_kib=(\d+)",
                  os.environ.get("LIBTPU_INIT_ARGS", ""))
    return int(m.group(1)) if m else 16 * 1024


_warned_vmem_widths: set = set()


def _check_scoped_vmem(C_pad: int) -> None:
    """Pre-flight the row-scan kernel's scoped-VMEM footprint.

    The kernel keeps whole (S, 128) rows resident: packed score words
    (ceil(V/4)·4C bytes), the carried row + ext offsets (8C), the query
    tile + initial row blocks (8C), and a checkpoint output block (4C),
    plus ~5.5 MiB of fixed Mosaic overhead (measured: a C=256k forward
    fill allocates 16.53 MiB against the 16 MiB default limit).  Above
    ~128k columns the DEFAULT limit OOMs at compile time with an opaque
    libtpu error — warn up front with the exact fix (the v5e has 128 MiB
    of physical VMEM; raising the scoped limit to 64 MiB unlocks the
    full MAX_WIDTH envelope, measured 4.12 s at 256k x 256k)."""
    need_kib = (44 * C_pad) // 1024 + 5632
    limit = _scoped_vmem_kib()
    if need_kib > limit and C_pad not in _warned_vmem_widths:
        _warned_vmem_widths.add(C_pad)
        if on_tpu():
            from ..observability import log

            log.warning(
                "wavefront row-scan at %d columns needs ~%d KiB of scoped"
                " VMEM but the libtpu limit is %d KiB — the compile will"
                " likely fail with 'Ran out of memory in memory space"
                " vmem'. Set LIBTPU_INIT_ARGS="
                "\"--xla_tpu_scoped_vmem_limit_kib=%d\" before process"
                " start (see deploy/aligner.env).",
                C_pad, need_kib, limit,
                max(65536, 1 << (need_kib - 1).bit_length()),
            )


def _prep(q, t, matrix, del_, ext, *, check_vmem=True):
    """Shared host prep: pad/pack operands.  Returns a dict of pieces.

    ``check_vmem`` runs the row-scan scoped-VMEM pre-flight (whole
    (S, 128) rows resident, footprint ~44·C_pad bytes) — callers whose
    kernel does NOT hold full rows in VMEM (the band-diagonal engine
    streams TD-column chunks of TB-row bands, footprint set by ``tb``
    not by C) must pass False to avoid a false "compile will likely
    fail" warning on wide pairs."""
    q = np.asarray(q, np.int32)
    t = np.asarray(t, np.int32)
    matrix = np.asarray(matrix)
    V = matrix.shape[0]
    if not supported(len(q), matrix, del_, ext, tlen=len(t)):
        raise ValueError("wavefront engine: integral matrix/penalties, "
                         f"qlen <= {MAX_WIDTH}, and int32-range scores "
                         "(see range_ok) required")
    if check_vmem:
        _check_scoped_vmem(_cdiv(len(q), LANES) * LANES or LANES)
    C_real, R_real = len(q), len(t)
    S = max(_cdiv(C_real, LANES), 1)
    C_pad = S * LANES
    qp = np.full(C_pad, V, np.int32)  # pad code V: scores stay 0-ish
    qp[:C_real] = q
    pmat = pack_matrix_words(matrix)
    return {
        "q": q, "t": t, "V": V, "C_real": C_real, "R_real": R_real,
        "S": S, "C_pad": C_pad,
        "q_tile": jnp.asarray(qp.reshape(S, LANES)),
        "pmat": jnp.asarray(pmat),
    }


def _unpack_dir_words(words: np.ndarray, C_pad: int) -> np.ndarray:
    """(n, S, 128) packed words → (n*16, C_pad) uint8 interior dirs."""
    n = words.shape[0]
    d = np.zeros((n * ROWS_PER_WORD, C_pad), np.uint8)
    flat = words.reshape(n, C_pad)
    for k in range(ROWS_PER_WORD):
        d[k::ROWS_PER_WORD] = ((flat >> (2 * k)) & 3).astype(np.uint8)
    return d


def fill_single_global(
    q: np.ndarray,
    t: np.ndarray,
    matrix: np.ndarray,
    del_: float,
    ext: float,
    *,
    with_dirs: bool = True,
    tr: int = 64,
    interpret: bool | None = None,
):
    """Exact global fill of ONE (query, target) pair on device.

    Returns ``(end_score, dirs)`` where ``dirs`` is the full
    (tlen+1, qlen+1) uint8 direction plane with reference borders
    (None in scores-only mode).  Requires :func:`supported` —
    integral matrix/penalties within int8, qlen <= MAX_WIDTH.
    """
    pp = _prep(q, t, matrix, del_, ext)
    S, C_real, R_real = pp["S"], pp["C_real"], pp["R_real"]
    if C_real == 0 or R_real == 0:
        raise ValueError("empty sequence")
    assert tr % ROWS_PER_WORD == 0
    R_pad = _cdiv(R_real, tr) * tr
    tp = np.zeros(R_pad, np.int32)
    tp[:R_real] = pp["t"]
    if interpret is None:
        interpret = not on_tpu()
    outs = _run(
        pp["q_tile"],
        jnp.asarray(tp.reshape(R_pad // tr, 1, tr)),
        pp["pmat"],
        jnp.zeros((S, LANES), jnp.int32),
        S=S, TR=tr, V=pp["V"], C_real=C_real, R_real=R_real,
        del_=int(del_), ext=int(ext), with_dirs=with_dirs,
        interpret=bool(interpret),
    )
    end = float(np.asarray(outs[0])[0, 0])
    dirs = None
    if with_dirs:
        d = _unpack_dir_words(np.asarray(outs[1]), pp["C_pad"])
        dirs = np.full((R_real + 1, C_real + 1), np.uint8(BEG))
        dirs[0, 1:] = np.uint8(LEFT)
        dirs[1:, 0] = np.uint8(TOP)
        dirs[1:, 1:] = d[:R_real, :C_real]
    return end, dirs


# ---------------------------------------------------------------------------
# Band-diagonal end-score kernel: the scan-free formulation.
#
# The row-scan above pays an irreducible ~3*log2(C) vector ops per row
# for the max-prefix-scan (48 of its ~70 ops/row at C=64k — measured
# within ~6% of that floor, docs/PERF_NOTES.md).  Cells on an
# anti-diagonal are mutually independent, so a diagonal step needs NO
# scan — but full-matrix diagonals waste half the lanes on a square pair
# (a diagonal averages L/2 of its L-lane tile; a straight anti-diagonal
# kernel measured 63 GCUPS vs the row-scan's 46 at 64k x 64k, only
# +39%).  The band formulation removes that waste: walk the matrix in
# TB-row bands and run the diagonals *inside* a band, so the tile is
# (TB/128, 128) and a band diagonal fills the whole tile except the
# O(TB/(C+TB)) ramp at each end.  Lane j holds local row j+1; at band
# step d it computes cell (band_base + j + 1, x = d - j):
#
#   left  = previous step, same lane (unshifted);
#   up    = previous step, lane j-1 (one flat shift; lane 0 is fed from
#           the previous band's boundary-row stream, one scalar/step);
#   diag  = two steps back, lane j-1 — exactly the previous step's
#           shifted ``up``, carried for free;
#   score = M[t, q] with per-lane FIXED t (packed words built once per
#           band) selected by the q-code stream that rolls one lane per
#           step — the mirror image of the row kernel's lookup.
#
# Bands hand off through their boundary row (the rb stream), which is
# also exactly the H-row checkpoint the chunked traceback wants.
# Trade-off: no direction planes in row layout — alignment requests
# keep the row-scan + replay path; this engine serves end scores (and
# boundary rows).  Cites: simple/mod.rs:42-98 (global fill; the tie
# policy is irrelevant here — no directions are derived).
#
# Since round 4 the per-band compute is :func:`run_block_band` (the
# column-sharded band kernel, defined with the sharded section below):
# the single-pair path is its x0 = 0, n = 1 specialization with the
# closed-form border column streamed as the left boundary — one kernel
# formulation serves both, and the unrolled short-chain rewrite lifted
# the measured 64k x 64k rate from 67.7 (round-3 kernel) to 124.7
# GCUPS (docs/PERF_NOTES.md round-4 section).
# ---------------------------------------------------------------------------


def pack_matrix_nibbles(matrix: np.ndarray) -> tuple[np.ndarray, int]:
    """Column-packed 4-bit score words ``(n_words, V)`` + bias: word g of
    column j holds the 8 biased nibbles matrix[8g..8g+7, j] - bias.
    Requires an integral entry range spanning <= 16 values (BLOSUM62 is
    -4..11); returns the same layout family as :func:`pack_matrix_words`
    with half the words (V=24: 3 instead of 6)."""
    mi = np.round(np.asarray(matrix)).astype(np.int64)
    lo, hi = int(mi.min()), int(mi.max())
    if hi - lo > 15:
        raise ValueError("pack_matrix_nibbles requires entry range <= 16")
    V = mi.shape[0]
    n_words = _cdiv(V, 8)
    pmat = np.zeros((n_words, mi.shape[1]), np.int64)
    for g in range(n_words):
        for k in range(8):
            v = 8 * g + k
            if v < V:
                pmat[g] += (mi[v] - lo) << (4 * k)
    return (
        (pmat & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
        .reshape(n_words, mi.shape[1])
    ), lo


NEG_I32 = -(2**30)


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "TD", "V", "Cb", "del_", "ext", "lut_bits", "bias2",
        "interpret",
    ),
)
def _run_band(
    t_bands,  # (n_bands, S, 128) i32 target codes, lanes = band rows
    qs,  # (n_chunks, 1, TD) i32 query-code stream (padded with V)
    pmat,  # (n_words, V) i32 packed matrix transpose
    lens,  # (2,) i32 [C_real, R_real] — TRACED, so one compiled program
    # serves every pair in the same padded bucket (compile-bucket lever)
    *,
    S: int,
    TD: int,
    V: int,
    Cb: int,
    del_: int,
    ext: int,
    lut_bits: int,
    bias2: int,
    interpret: bool,
):
    """Single-pair band scan: ``lax.scan`` over TB-row bands, each
    filled by :func:`run_block_band` with the closed-form global border
    column as its left boundary (the x0 = 0, n = 1 specialization of
    the sharded pipeline — ONE kernel formulation serves both).
    Returns the exact end score H[tlen, qlen] (int32)."""
    n_bands = t_bands.shape[0]
    n_chunks = qs.shape[0]
    TB = S * LANES
    D_pad = n_chunks * TD
    DEL = jnp.int32(del_)
    EXT = jnp.int32(ext)
    C_real = lens[0]
    R_real = lens[1]
    dvec = jnp.arange(D_pad, dtype=jnp.int32) + 1  # band step d
    khat = (dvec - 1) * EXT  # hat offset of stream slot d-1
    # top-row stream of band 0: the global border row (pre-hatted,
    # UNcorrected — see the sharded pipeline's fd-stream note)
    prev0 = jnp.where(
        dvec == C_real, -(C_real + 1) * DEL, -dvec * DEL
    ) + khat

    def band_body(carry, xs):
        prev, end = carry
        t_band, jb = xs
        y_base = jb * TB
        # left boundary = the border column H[y, 0] with the far-corner
        # overwrite (simple/mod.rs:59-70)
        ys = y_base + jnp.arange(TB + 1, dtype=jnp.int32)
        lb = jnp.where(ys == R_real, -(R_real + 1) * DEL, -ys * DEL)
        lbp = jnp.zeros(D_pad, jnp.int32).at[:TB].set(lb[:TB])
        lbc = jnp.zeros(D_pad, jnp.int32).at[:TB].set(lb[1:])
        c1 = lbp + (dvec - 2) * EXT
        c2 = lbc + (dvec - 1) * EXT
        # cell (1,1) is the only del-penalty cell (simple/mod.rs:72)
        c2 = c2.at[0].add(jnp.where(jb == 0, -(DEL - EXT), 0))
        f = prev.at[0].add(jnp.where(jb == 0, -(DEL - EXT), 0))
        fd = jnp.concatenate([jnp.zeros(1, jnp.int32), prev[:-1]])
        j_end = R_real - 1 - y_base
        d_end = C_real + j_end
        owned = (j_end >= 0) & (j_end < TB)
        scal = jnp.stack(
            [j_end, d_end, owned.astype(jnp.int32)]
        ).reshape(1, 3)
        rb, _, endv = run_block_band(
            t_band, qs,
            f.reshape(n_chunks, 1, TD),
            c1.reshape(n_chunks, 1, TD),
            c2.reshape(n_chunks, 1, TD),
            fd.reshape(n_chunks, 1, TD),
            pmat, scal,
            S=S, TD=TD, V=V, Cb=Cb, ext=ext,
            lut_bits=lut_bits, bias2=bias2, interpret=interpret,
            with_rc=False,
        )
        # bottom-row stream → next band's top-row stream: the de-hat,
        # TB-1 slot shift, and re-hat telescope to one constant offset
        rb_flat = rb.reshape(D_pad)
        nxt = jnp.concatenate(
            [rb_flat[TB - 1:], jnp.zeros(TB - 1, jnp.int32)]
        ) - TB * EXT
        end = jnp.where(owned, endv[0, 0], end)
        return (nxt, end), None

    (_, end), _ = lax.scan(
        band_body, (prev0, jnp.int32(NEG_I32)),
        (t_bands, jnp.arange(n_bands, dtype=jnp.int32)),
    )
    return end


def end_score_single_global_diag(
    q: np.ndarray,
    t: np.ndarray,
    matrix: np.ndarray,
    del_: float,
    ext: float,
    *,
    tb: int = 16384,
    td: int = 512,
    interpret: bool | None = None,
) -> float:
    """Exact global end score H[tlen, qlen] of one pair via the
    band-diagonal kernel — scores only (see the section comment above
    for why it cannot produce alignments).  Requires :func:`supported`.
    ``tb`` is the band height (rows per band, multiple of 128): 16384
    measured best at 64k x 64k across rounds — 124.7 GCUPS with the
    round-4 unrolled short-chain kernel vs 67.7 for the round-3 kernel
    this replaced (docs/PERF_NOTES.md)."""
    # band VMEM scales with tb (<=16k default), not qlen — the row-scan
    # pre-flight's 44*C model does not apply here
    pp = _prep(q, t, matrix, del_, ext, check_vmem=False)
    C_real, R_real = pp["C_real"], pp["R_real"]
    if C_real == 0 or R_real == 0:
        raise ValueError("empty sequence")
    if tb % LANES:
        raise ValueError(f"tb must be a multiple of {LANES}, got {tb}")
    TB = min(tb, max(_cdiv(R_real, LANES) * LANES, LANES))
    S = TB // LANES
    # one source of truth for nibble-vs-byte eligibility (the batch
    # engines' policy, pallas_dp.lut_params); only the packing layout
    # (transposed words + the band's ext-folded bias) is band-specific
    from .pallas_dp import lut_params

    if lut_params(np.asarray(matrix))[1] == 4:
        pmat, bias = pack_matrix_nibbles(np.asarray(matrix).T)
        lut_bits, bias2 = 4, bias + 2 * int(ext)
    else:
        pmat = np.asarray(pack_matrix_words(np.asarray(matrix).T))
        lut_bits, bias2 = 8, 2 * int(ext) - 128
    n_bands = _cdiv(R_real, TB)
    tp = np.zeros(n_bands * TB, np.int32)
    tp[:R_real] = pp["t"]
    Cb = pp["C_pad"]
    D_pad = _cdiv(Cb + TB - 1, td) * td
    qs = np.full(D_pad, pp["V"], np.int32)
    qs[:C_real] = pp["q"]
    if interpret is None:
        interpret = not on_tpu()
    end = _run_band(
        jnp.asarray(tp.reshape(n_bands, S, LANES)),
        jnp.asarray(qs.reshape(D_pad // td, 1, td)),
        jnp.asarray(pmat),
        jnp.asarray([C_real, R_real], jnp.int32),
        S=S, TD=td, V=pp["V"], Cb=Cb,
        del_=int(del_), ext=int(ext),
        lut_bits=lut_bits, bias2=bias2, interpret=bool(interpret),
    )
    return float(np.asarray(end))


# ---------------------------------------------------------------------------
# Column-sharded block fill: the per-device compute step of the cross-chip
# wavefront (parallel/wavefront_sp.py).  One call fills TR rows of THIS
# device's column block, given the carried previous row and the per-row
# left-boundary vector received from the left neighbor; it returns the new
# row and the per-row right boundary to ship onward.  x0 (global column
# offset) and y_base (absolute row of the block start) are *traced*
# scalars because they differ per device / pipeline step under shard_map.
# ---------------------------------------------------------------------------


def _kernel_block_cs(
    pw_ref,  # (n_words, S, 128) i32 packed score words by query symbol
    # — built ONCE per device outside the kernel (it depends only on the
    # local query), not per pipeline step
    t_ref,  # (1, TR) i32 target codes of this row block (SMEM)
    h0_ref,  # (S, 128) i32 previous row (local columns)
    lb_ref,  # (1, TR + 1) i32: H[y_base + r, x0] for r = 0..TR (SMEM)
    scal_ref,  # (1, 4) i32 SMEM: [x0, y_base, C_real, R_real] — all
    # traced: one compiled block program serves every pair whose padded
    # bucket (S, TR) matches (see _kernel's scal_ref note)
    hout_ref,  # (S, 128) i32 out: new row
    rb_ref,  # (1, TR) i32 out (SMEM): right boundary per row
    end_ref,  # (1, 1) i32 out (SMEM): H[tlen, qlen] when owned
    *refs,
    S: int,
    TR: int,
    V: int,
    del_: int,
    ext: int,
    with_dirs: bool,
):
    if with_dirs:
        dirs_ref = refs[0]
        refs = refs[1:]
    (h_ref,) = refs
    P = jnp.int32(ext)
    DEL = jnp.int32(del_)
    sub = lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    flat = sub * LANES + lane
    x0 = scal_ref[0, 0]
    y_base = scal_ref[0, 1]
    C_real = scal_ref[0, 2]
    R_real = scal_ref[0, 3]
    xg1 = x0 + flat + 1  # global 1-based column per lane
    xp = xg1 * P
    c_local = C_real - 1 - x0  # end cell's local flat index

    end_ref[0, 0] = 0  # only the owning block overwrites
    h_ref[:] = h0_ref[:]

    def row(r, word):
        y = y_base + r + 1
        ty = t_ref[0, r]
        w = pw_ref[ty >> 2]
        srow = ((w >> ((ty & 3) * 8)) & 255) - 128
        prev = h_ref[:]
        bprev = lb_ref[0, r]  # H[y-1, x0]
        bcur = lb_ref[0, r + 1]  # H[y, x0]
        diag = _flat_shift_right(prev, bprev, S)
        dv = diag + srow
        m0 = jnp.maximum(dv, prev - P)
        first = flat == 0
        is11 = (y == 1) & (x0 == 0)  # global cell (1,1): del penalty
        pen1 = jnp.where(is11, DEL, P)
        a = jnp.where(
            first,
            jnp.maximum(
                jnp.where(is11, jnp.maximum(dv, prev - pen1), m0),
                bcur - pen1,
            ),
            m0,
        )
        h = _prefix_max_flat(a + xp, S) - xp
        h_ref[:] = h
        rb_ref[0, r] = h[S - 1, LANES - 1]
        @pl.when((y == R_real) & (c_local >= 0) & (c_local < S * LANES))
        def _end():
            # one-hot masked reduction: dynamic per-lane reads are not a
            # vector op, a masked sum is
            end_ref[0, 0] = jnp.sum(jnp.where(flat == c_local, h, 0))
        if with_dirs:
            # same tie policy as _kernel (top > left > diagonal,
            # enums.rs:18-28); the only DEL-penalty cell is global (1,1)
            pen_d = jnp.where(is11 & first, DEL, P)
            top = prev - pen_d
            leftv = _flat_shift_right(h, bcur, S) - pen_d
            d = jnp.where(
                h <= top,
                jnp.int32(TOP),
                jnp.where(h <= leftv, jnp.int32(LEFT), jnp.int32(DIAG)),
            )
            word = word | (d << (2 * (r % ROWS_PER_WORD)))
            @pl.when(r % ROWS_PER_WORD == ROWS_PER_WORD - 1)
            def _store():
                dirs_ref[r // ROWS_PER_WORD] = word
            word = jnp.where(r % ROWS_PER_WORD == ROWS_PER_WORD - 1, 0, word)
        return word

    lax.fori_loop(0, TR, row, jnp.zeros((S, LANES), jnp.int32))
    hout_ref[:] = h_ref[:]


def pack_query_words(q_tile, pmat, V: int):
    """Per-query packed score words pw[g][x] = the 4 biased bytes
    mat[4g..4g+3, q[x]], as plain jnp ops — computed once per device and
    fed to :func:`run_block_cs` (the table depends only on the query)."""
    n_words = _cdiv(V, 4)
    rows = []
    for g in range(n_words):
        w = jnp.zeros(q_tile.shape, jnp.int32)
        for v in range(V):
            w = w + pmat[g, v] * (q_tile == v).astype(jnp.int32)
        rows.append(w)
    return jnp.stack(rows)  # (n_words, S, 128)


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "TR", "V", "del_", "ext", "interpret",
        "with_dirs",
    ),
)
def run_block_cs(
    pw,  # (n_words, S, 128) i32 from pack_query_words
    t_rows,  # (1, TR) i32
    h_prev,  # (S, 128) i32
    lbound,  # (1, TR + 1) i32
    scalars,  # (1, 4) i32: [x0, y_base, C_real, R_real]
    *,
    S: int,
    TR: int,
    V: int,
    del_: int,
    ext: int,
    interpret: bool,
    with_dirs: bool = False,
):
    """One column-sharded row-block fill.  Returns (h_new, rights, end)
    — plus a packed (TR/16, S, 128) direction-word tile when
    ``with_dirs`` (the traceback replay path of the cross-chip
    wavefront) — where ``end`` is H[tlen, qlen] if this block/device
    owns it else 0."""
    kernel = functools.partial(
        _kernel_block_cs,
        S=S, TR=TR, V=V,
        del_=int(del_), ext=int(ext), with_dirs=with_dirs,
    )
    n_words = _cdiv(V, 4)
    out_specs = [
        pl.BlockSpec((S, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TR), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((S, LANES), jnp.int32),
        jax.ShapeDtypeStruct((1, TR), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
    ]
    if with_dirs:
        assert TR % ROWS_PER_WORD == 0
        out_specs.append(
            pl.BlockSpec(
                (TR // ROWS_PER_WORD, S, LANES), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((TR // ROWS_PER_WORD, S, LANES), jnp.int32)
        )
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_words, S, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR + 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[
            pltpu.VMEM((S, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(pw, t_rows, h_prev, lbound, scalars)
    return out


# ---------------------------------------------------------------------------
# Band-diagonal column-sharded block fill (round 4).  The row-scan block
# engine above (run_block_cs) pays ~3*log2(Cb) vector ops per row for its
# max-prefix-scan; the band formulation (see the band-diagonal section
# comment) needs no scan at all.  This kernel is its column-sharded
# generalization: the closed-form border column of the single-pair band
# kernel becomes a STREAMED left-boundary column (received from the left
# neighbor over ICI), and two extra captures produce what the pipeline
# ships onward: the right-boundary column (one value per row, captured
# as each lane exits its last column) and the block's bottom row (the
# boundary-row stream — the next block's top row and the traceback's
# H-row checkpoint).
#
# Dependence-chain rewrite (the round-3 "latency floor" fix): the band
# kernel carried a roll → max → max → subtract chain (~4 dependent
# vector ops/step), measured as a ~100-cycle/step floor that forced
# TB=16384 (docs/PERF_NOTES.md §3).  Working in "hat" coordinates
# ``ĥ_d = h_d + d·ext`` removes the penalty subtraction from the
# recurrence entirely:
#
#     ĥ_d = max( u_{d-2} + (s + 2·ext),  u_{d-1},  ĥ_{d-1} ),
#     u_d = flat_shift_right(ĥ_d, top-row fill)
#
# (u = the flat roll; the +2·ext folds into the score LUT bias), and
# lanes not yet entered hold a NEG sentinel — the per-lane max is
# monotone, so they stay inert until their entering step.  The per-step
# critical path is two maxes with the roll issued in parallel; the score
# extract, the entering-lane scalar streams, and all captures hang
# off-chain.  De-hatting happens once per block at the boundaries
# (outside the kernel for the streams, at finalize for rc/end).
# Semantics: identical global recurrence as run_block_cs / the oracle
# (simple/mod.rs:42-98; cell (1,1) del-penalty folded into the scalar
# streams by the caller).  Scores/boundaries only — no directions (the
# traceback replay path keeps run_block_cs, see wavefront_sp).
# ---------------------------------------------------------------------------


def _kernel_band_cs(
    t_ref,  # (S, 128) i32: target codes t[y_base + j] per lane (VMEM)
    q_ref,  # (1, 1, TD) i32 SMEM: local query-code stream, slot k = q[d-1]
    f_ref,  # (1, 1, TD) i32 SMEM: PRE-HATTED top-row fill stream,
    # slot k = H[y_base, x=d] + (d-1)·ext (is11 up-correction folded in)
    c1_ref,  # (1, 1, TD) i32 SMEM: entering-lane diag scalar stream,
    # slot k = lb[d-1] + (d-2)·ext
    c2_ref,  # (1, 1, TD) i32 SMEM: entering-lane left scalar stream,
    # slot k = lb[d] + (d-1)·ext (is11 left-correction folded in)
    fd_ref,  # (1, 1, TD) i32 SMEM: lane-0 diag scalar stream, slot k =
    # H[y_base, x=d-1] + (d-2)·ext, UNcorrected.  Lane 0's diagonal
    # cannot come from the u2 carry: the roll fill does double duty (up
    # at step d, diag at step d+1) and the (1,1) del-up correction in
    # the f stream must not leak into the next cell's diagonal
    pmat_ref,  # (n_words, V) i32 SMEM: packed matrix TRANSPOSE (t fixed
    # per lane, q streams — the band-kernel lookup orientation)
    scal_ref,  # (1, 3) i32 SMEM: [j_end, d_end, owned] — end-cell lane,
    # its capture step, and whether this block owns H[tlen, qlen]; all
    # traced so one compiled program serves every pair in a padded bucket
    rb_ref,  # (TD//128, 1, 128) i32 out chunk (VMEM): bottom-row stream
    # in HAT coordinates; flat slot k = ĥ at step d=k+1 of lane TB-1
    rc_ref,  # (S, 128) i32 out (VMEM): right-boundary column, PLAIN —
    # flat j = H[y_base + j + 1, x0 + Cb]
    end_ref,  # (1, 1) i32 out (SMEM): H[tlen, qlen] if owned else 0
    a_ref,  # (S, 128) scratch: ĥ of the previous step
    u2_ref,  # (S, 128) scratch: roll(ĥ) from two steps back
    qrow_ref,  # (S, 128) scratch: q codes per lane on this diagonal
    eacc_ref,  # (S, 128) scratch: end-cell accumulator (hat)
    rcs_ref,  # (S, 128) scratch: right-boundary accumulator (hat)
    pw_ref,  # (n_words, S, 128) scratch: packed score words by t symbol
    *,
    S: int,
    TD: int,
    V: int,
    Cb: int,
    ext: int,
    lut_bits: int,
    bias2: int,  # lut_bias + 2·ext (nibble) / 2·ext - 128 (byte) folded
    with_rc: bool,
    ud: int,  # step-loop unroll: amortizes per-iteration loop/scalar
    # overhead and lets Mosaic overlap consecutive steps' 2-deep chains
    # (the same lever as the row kernel's UNROLL=8 — the band step was
    # measured floor-bound at ~150 cycles un-unrolled, round 4)
):
    from .pallas_dp import _bit_select

    i = pl.program_id(0)
    per_word = 8 if lut_bits == 4 else 4
    n_words = _cdiv(V, per_word)
    P = jnp.int32(ext)
    sub = lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    lane1 = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    flat = sub * LANES + lane  # local row j = y - y_base - 1
    j_end = scal_ref[0, 0]
    d_end = scal_ref[0, 1]
    owned = scal_ref[0, 2]
    emask = flat == j_end  # end-cell lane mask (per-block constant)
    first = flat == 0  # lane 0 (its diag comes from the fd stream)

    @pl.when(i == 0)
    def _init():
        tx = t_ref[:]
        for g in range(n_words):
            w = jnp.zeros((S, LANES), jnp.int32)
            for v in range(V):
                w = w + pmat_ref[g, v] * (tx == v).astype(jnp.int32)
            pw_ref[g] = w
        a_ref[:] = jnp.full((S, LANES), NEG_I32, jnp.int32)
        u2_ref[:] = jnp.full((S, LANES), NEG_I32, jnp.int32)
        qrow_ref[:] = jnp.zeros((S, LANES), jnp.int32)
        eacc_ref[:] = jnp.zeros((S, LANES), jnp.int32)
        rcs_ref[:] = jnp.zeros((S, LANES), jnp.int32)

    pw = [pw_ref[g] for g in range(n_words)]

    assert TD % ud == 0 and LANES % ud == 0

    def step(k, carry):
        a, u2, qrow, eacc, rcs, racc = carry
        d = i * TD + k + 1  # 1-based band step; lane j: (y_base+j+1, d-j)
        # --- off-chain: score extract + entering-lane scalars ---
        qrow = _flat_shift_right(qrow, q_ref[0, 0, k], S)
        if lut_bits == 4:
            w = _bit_select(pw, qrow, start_bit=8)
            s2 = ((w >> ((qrow & 7) << 2)) & 15) + bias2
        else:
            w = _bit_select(pw, qrow, start_bit=4)
            s2 = ((w >> ((qrow & 3) << 3)) & 255) + bias2
        A = u2 + s2
        A = jnp.where(first, s2 + fd_ref[0, 0, k], A)
        entering = flat == d - 1
        Ae = jnp.maximum(s2 + c1_ref[0, 0, k], c2_ref[0, 0, k])
        A = jnp.where(entering, Ae, A)
        # --- the 2-deep chain: max ∥ roll, then max ---
        t1 = jnp.maximum(A, a)
        u1 = _flat_shift_right(a, f_ref[0, 0, k], S)
        h = jnp.maximum(t1, u1)
        # --- captures (off-chain) ---
        eacc = jnp.where(emask & (d == d_end), h, eacc)
        if with_rc:
            rcs = jnp.where(flat == d - Cb, h, rcs)
        tail = pltpu.roll(h[S - 1 : S, :], shift=(k + 1) % LANES, axis=1)
        racc = jnp.where(lane1 == k % LANES, tail, racc)
        return (h, u1, qrow, eacc, rcs, racc)

    def block(kk, carry):
        for u in range(ud):
            k = kk * ud + u
            carry = step(k, carry)
            if u == ud - 1:
                racc = carry[-1]

                @pl.when(k % LANES == LANES - 1)
                def _store():
                    rb_ref[k // LANES] = racc

        return carry

    a, u2, qrow, eacc, rcs, _ = lax.fori_loop(
        0, TD // ud, block,
        (a_ref[:], u2_ref[:], qrow_ref[:], eacc_ref[:], rcs_ref[:],
         jnp.zeros((1, LANES), jnp.int32)),
    )
    a_ref[:] = a
    u2_ref[:] = u2
    qrow_ref[:] = qrow
    eacc_ref[:] = eacc
    rcs_ref[:] = rcs

    @pl.when(i == pl.num_programs(0) - 1)
    def _fin():
        # de-hat: lane j's right-boundary cell was captured at step
        # d = Cb + j; the end cell at step d_end
        if with_rc:
            rc_ref[:] = rcs - (flat + Cb) * P
        else:
            rc_ref[:] = jnp.zeros((S, LANES), jnp.int32)
        end_ref[0, 0] = jnp.where(
            owned == 1, jnp.sum(eacc) - d_end * P, jnp.int32(0)
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "TD", "V", "Cb", "ext", "lut_bits", "bias2",
        "interpret", "with_rc", "ud",
    ),
)
def run_block_band(
    t_band,  # (S, 128) i32 target codes of this row block
    q_chunks,  # (n_chunks, 1, TD) i32 local query-code stream
    f_chunks,  # (n_chunks, 1, TD) i32 pre-hatted top-row fill stream
    c1_chunks,  # (n_chunks, 1, TD) i32 entering-lane diag scalars
    c2_chunks,  # (n_chunks, 1, TD) i32 entering-lane left scalars
    fd_chunks,  # (n_chunks, 1, TD) i32 lane-0 diag scalars (clean)
    pmat,  # (n_words, V) i32 packed matrix transpose
    scal,  # (1, 3) i32: [j_end, d_end, owned]
    *,
    S: int,
    TD: int,
    V: int,
    Cb: int,
    ext: int,
    lut_bits: int,
    bias2: int,
    interpret: bool,
    with_rc: bool = True,
    ud: int = 32,  # measured optimum at TB=16384 on v5e (124.7 GCUPS
    # vs 108.6 at ud=8, 58.6 un-unrolled; ud=64 regresses to 122.7)
):
    """One band-diagonal column-sharded block fill (TB = S·128 rows ×
    Cb columns).  Returns ``(rb, rc, end)``: the bottom-row stream in
    hat coordinates ((n_chunks·TD/128, 1, 128); de-hat with
    ``- (slot+1)·ext``), the plain right-boundary column ((S, 128), flat
    j = row y_base+j+1), and H[tlen, qlen] if owned (see
    :func:`_kernel_band_cs` for the stream contracts)."""
    n_chunks = q_chunks.shape[0]
    assert TD % LANES == 0, "TD must be a multiple of 128 (rb grouping)"
    G = TD // LANES
    kernel = functools.partial(
        _kernel_band_cs,
        S=S, TD=TD, V=V, Cb=Cb, ext=ext,
        lut_bits=lut_bits, bias2=bias2, with_rc=with_rc, ud=ud,
    )
    per_word = 8 if lut_bits == 4 else 4
    n_words = _cdiv(V, per_word)
    stream = lambda: pl.BlockSpec(  # noqa: E731
        (1, 1, TD), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((S, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            stream(), stream(), stream(), stream(), stream(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks * G, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, LANES), jnp.int32),  # a (prev step ĥ)
            pltpu.VMEM((S, LANES), jnp.int32),  # u2 (2-ago roll)
            pltpu.VMEM((S, LANES), jnp.int32),  # qrow
            pltpu.VMEM((S, LANES), jnp.int32),  # eacc
            pltpu.VMEM((S, LANES), jnp.int32),  # rcs
            pltpu.VMEM((n_words, S, LANES), jnp.int32),  # pw
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(t_band, q_chunks, f_chunks, c1_chunks, c2_chunks, fd_chunks, pmat,
      scal)


def walk_tile_inner(get_d, y, x, n, buf):
    """Device-side backward walk WITHIN one replayed block/tile.

    ``get_d(r, c)`` yields the int32 direction of the 0-based interior
    cell (r, c) relative to the block.  Walks from the 1-based
    tile-relative entry ``(y, x)`` until the cursor leaves the block's
    top (y == 0) or left (x == 0) edge, appending one 2-bit code per
    step into ``buf`` at the running count ``n`` (BEG cannot occur in
    global interiors, so every code moves the cursor and the loop
    terminates).  Shared by the single-chip chunked walk and both
    sharded replay engines — their outer block loops carry (n, buf)
    through successive tiles.

    Returns the updated (y, x, n, buf)."""

    def cond(c):
        y, x, _, _ = c
        return (y > 0) & (x > 0)

    def body(c):
        y, x, n, buf = c
        d = get_d(y - 1, x - 1)
        up = (d == TOP) | (d == DIAG)
        lf = (d == LEFT) | (d == DIAG)
        return (
            y - up.astype(jnp.int32),
            x - lf.astype(jnp.int32),
            n + 1,
            buf.at[n].set(d),
        )

    return lax.while_loop(cond, body, (y, x, n, buf))


def pack_walk_steps(buf):
    """(BUD16,) int32 step codes → (BUD16/16,) packed 16-codes-per-word."""
    shifts = jnp.arange(16, dtype=jnp.int32) * 2
    return (
        (buf.reshape(-1, 16) << shifts[None, :])
        .sum(axis=1)
        .astype(jnp.int32)
    )


def packed_words_get_d(flat):
    """get_d closure over a (rows/16, C_pad) packed direction-word
    plane in the pallas fills' layout: row r at word r>>4, bit
    2·(r&15)."""
    def get_d(r, c):
        w = flat[r >> 4, c]  # ROWS_PER_WORD == 16
        return (w >> ((r & 15) * 2)) & 3

    return get_d


def steps_to_chunks(packed, n, cy, cx, q, t):
    """Host-side decode of one device walk's step stream.

    ``(cy, cx)`` is the absolute 1-based entry cell; returns the
    (qa, ta) int16 chunk pair in walk (reverse-alignment) order by
    cursor replay — position BEFORE each step via cumulative sums, no
    plane access (same scheme as ops/device_walk.decode_pair)."""
    from ..alphabet import BLANK
    from .device_walk import _cursor_replay

    ds = _unpack_step_words(np.asarray(packed), n)
    y_at, x_at = _cursor_replay(ds, cy, cx)
    qa = np.where(ds == TOP, BLANK, q[x_at - 1]).astype(np.int16)
    ta = np.where(ds == LEFT, BLANK, t[y_at - 1]).astype(np.int16)
    return qa, ta


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "TR", "V", "del_", "ext", "interpret",
        "TB", "NCK",
    ),
)
def _replay_walk_all(
    q_tile, tp_dev, pmat, ckpts_dev,
    *, S, TR, V, C_real, R_real, del_, ext, interpret, TB, NCK,
):
    """Replay and walk the ENTIRE backward traceback in one dispatch.

    An outer ``while_loop`` visits the tb-row blocks the walk actually
    crosses, top-entry downward: each iteration refills block
    j = (cy-1)//TB *with* directions from its H-row checkpoint (the
    pallas `_run` inside the loop body), then an inner ``while_loop``
    walks it until the cursor leaves the block top (next outer
    iteration) or hits the border column (done).  The packed direction
    words never leave HBM and the host sees ONE launch for the whole
    traceback — versus one per block, which cost a full round-trip per
    2048 rows on high-RTT links (and per-launch overhead anywhere).

    ``tp_dev`` is the (NCK·TB,) padded target; ``ckpts_dev`` the
    (NCK, S, 128) forward H-row checkpoints, ckpts[k] = H[(k+1)·TB].

    Returns (packed steps — 16 codes/word, BEG-padded; n steps; final
    cy; final cx) with (cy, cx) on a border (cy == 0 or cx == 0).
    """
    C_pad = S * LANES
    BUD16 = _cdiv(NCK * TB + C_pad + 1, 16) * 16
    zeros_h0 = jnp.zeros((S, LANES), jnp.int32)

    def outer_cond(c):
        cy, cx, _, _ = c
        return (cy > 0) & (cx > 0)

    def outer_body(c):
        cy, cx, n, buf = c
        j = (cy - 1) // TB
        h0 = jnp.where(
            j == 0,
            zeros_h0,
            lax.dynamic_index_in_dim(
                ckpts_dev, jnp.maximum(j - 1, 0), axis=0, keepdims=False
            ),
        )
        t_rows = lax.dynamic_slice(tp_dev, (j * TB,), (TB,)).reshape(
            TB // TR, 1, TR
        )
        outs = _run(
            q_tile, t_rows, pmat, h0, j * TB,
            S=S, TR=TR, V=V, C_real=C_real, R_real=R_real,
            del_=del_, ext=ext, with_dirs=True, interpret=interpret,
        )
        flat = outs[1].reshape(TB // ROWS_PER_WORD, C_pad)
        y, x, n, buf = walk_tile_inner(
            packed_words_get_d(flat), cy - j * TB, cx, n, buf
        )
        return (j * TB + y, x, n, buf)

    init = (
        jnp.int32(R_real),
        jnp.int32(C_real),
        jnp.int32(0),
        jnp.full((BUD16,), BEG, jnp.int32),
    )
    cy, cx, n, buf = lax.while_loop(outer_cond, outer_body, init)
    return pack_walk_steps(buf), n, cy, cx


def _unpack_step_words(packed: np.ndarray, n: int) -> np.ndarray:
    """(W,) int32 packed 2-bit step codes → (n,) uint8."""
    k = np.arange(16, dtype=np.int32) * 2
    d = (packed[:, None] >> k[None, :]) & 3
    return d.reshape(-1)[:n].astype(np.uint8)


def align_single_global_chunked(
    q: np.ndarray,
    t: np.ndarray,
    matrix: np.ndarray,
    del_: float,
    ext: float,
    *,
    tb_rows: int = 2048,
    tr: int = 64,
    interpret: bool | None = None,
):
    """Exact alignment of ONE huge global pair in bounded memory.

    Checkpoint-and-replay traceback: a scores-only forward fill stores
    one H row every ``tb_rows`` rows (O(R/tb · C) ints instead of an
    O(R·C) direction plane); the backward walk then re-fills one
    tb-row block at a time *with* directions — the replayed block is
    the identical DP restricted to those rows, so the walk follows the
    exact same directions the reference's full-plane traceback would
    (no tie-break divergence by construction).  ~2x fill cost total.

    Returns ``(end_score, qa, ta, coords)`` with the reference's
    traceback semantics (seeded last characters, simple/mod.rs:99-127).
    """
    pp = _prep(q, t, matrix, del_, ext)
    q, t = pp["q"], pp["t"]
    S, C_real, R_real, C_pad = pp["S"], pp["C_real"], pp["R_real"], pp["C_pad"]
    if C_real == 0 or R_real == 0:
        raise ValueError("empty sequence")
    assert tb_rows % tr == 0
    # the direction replay packs 16 rows per word (TR // ROWS_PER_WORD
    # blocks) — a smaller tr would silently floor to zero-size outputs
    assert tr % ROWS_PER_WORD == 0, "tr must be a multiple of 16"
    if interpret is None:
        interpret = not on_tpu()

    # --- forward: scores-only with checkpoints every tb_rows ---
    # clamp the block size to the (tr-aligned) target length so
    # wide-short pairs don't fill and replay mostly padding
    TB = min(tb_rows, max(_cdiv(R_real, tr) * tr, tr))
    R_pad = _cdiv(R_real, TB) * TB  # block-align so replays are uniform
    tp = np.zeros(R_pad, np.int32)
    tp[:R_real] = t
    outs = _run(
        pp["q_tile"],
        jnp.asarray(tp.reshape(R_pad // tr, 1, tr)),
        pp["pmat"],
        jnp.zeros((S, LANES), jnp.int32),
        S=S, TR=tr, V=pp["V"], C_real=C_real, R_real=R_real,
        del_=int(del_), ext=int(ext), with_dirs=False,
        interpret=bool(interpret), ckpt_every=TB,
    )
    end = float(np.asarray(outs[0])[0, 0])
    ckpts_dev = outs[1]  # (n_ck, S, 128); ckpts[k] = H[(k+1)*TB]

    _ckpts_host: list[np.ndarray] = []  # lazy one-shot download cache

    def _block_h0(j: int):
        # host-walk fallback only: pulls the checkpoint rows down ONCE,
        # on the first crossed block — np.asarray inside the per-block
        # call would re-transfer the whole (R/TB, S, 128) array per
        # block, O((R/TB)^2 * C) through the tunnel (the default device
        # walk reads ckpts_dev in place and never pays any of this)
        if j == 0:
            return jnp.zeros((S, LANES), jnp.int32)
        if not _ckpts_host:
            _ckpts_host.append(np.asarray(ckpts_dev))
        return jnp.asarray(_ckpts_host[0][j - 1])

    def replay_block(j: int) -> np.ndarray:
        """Interior dirs (TB, C_pad) of rows j*TB+1 .. (j+1)*TB."""
        t_rows = tp[j * TB : (j + 1) * TB]
        routs = _run(
            pp["q_tile"],
            jnp.asarray(t_rows.reshape(TB // tr, 1, tr)),
            pp["pmat"],
            _block_h0(j),
            np.int32(j * TB),
            S=S, TR=tr, V=pp["V"], C_real=C_real, R_real=R_real,
            del_=int(del_), ext=int(ext), with_dirs=True,
            interpret=bool(interpret),
        )
        return _unpack_dir_words(np.asarray(routs[1]), C_pad)

    # --- backward walk (simple/mod.rs:99-127 semantics, chunked) ---
    # default: the WHOLE traceback (every block replay + walk) runs in
    # one device dispatch; only the 2-bit step stream returns.
    # ALIGNER_DEVICE_WALK=0 restores the host per-cell walk over
    # downloaded direction blocks
    use_device_walk = os.environ.get("ALIGNER_DEVICE_WALK", "1") != "0"
    from ..alphabet import BLANK
    qa_chunks = [np.array([q[-1]], np.int16)]
    ta_chunks = [np.array([t[-1]], np.int16)]
    cy, cx = R_real, C_real
    if use_device_walk:
        packed, n, cy_f, cx_f = _replay_walk_all(
            pp["q_tile"],
            jnp.asarray(tp),
            pp["pmat"],
            ckpts_dev,
            S=S, TR=tr, V=pp["V"], C_real=C_real, R_real=R_real,
            del_=int(del_), ext=int(ext), interpret=bool(interpret),
            TB=TB, NCK=R_pad // TB,
        )
        qa_c, ta_c = steps_to_chunks(packed, int(n), cy, cx, q, t)
        qa_chunks.append(qa_c)
        ta_chunks.append(ta_c)
        cy, cx = int(cy_f), int(cx_f)
    else:
        cur_j = -1
        block = None
        while cy > 0 and cx > 0:
            j = (cy - 1) // TB
            if j != cur_j:
                block = replay_block(j)
                cur_j = j
            dr = block[cy - 1 - j * TB, cx - 1]
            if dr == TOP:
                qa_chunks.append(np.array([BLANK], np.int16))
                ta_chunks.append(np.array([t[cy - 1]], np.int16))
                cy -= 1
            elif dr == LEFT:
                qa_chunks.append(np.array([q[cx - 1]], np.int16))
                ta_chunks.append(np.array([BLANK], np.int16))
                cx -= 1
            else:  # DIAG (BEG cannot occur in global interiors)
                qa_chunks.append(np.array([q[cx - 1]], np.int16))
                ta_chunks.append(np.array([t[cy - 1]], np.int16))
                cy -= 1
                cx -= 1
    if cx > 0:
        # border row: LEFT until (0, 0) (simple/mod.rs:61)
        qa_chunks.append(q[:cx][::-1].astype(np.int16))
        ta_chunks.append(np.full(cx, BLANK, np.int16))
    if cy > 0:
        # border column: TOP until (0, 0) (simple/mod.rs:66)
        qa_chunks.append(np.full(cy, BLANK, np.int16))
        ta_chunks.append(t[:cy][::-1].astype(np.int16))
    qa = np.concatenate(qa_chunks)[::-1]
    ta = np.concatenate(ta_chunks)[::-1]
    return (
        end,
        np.ascontiguousarray(qa),
        np.ascontiguousarray(ta),
        ((1, C_real), (1, R_real)),
    )
