"""On-device batched traceback.

The batched fills produce direction planes in device HBM; the walks
were host-side (``native.an_traceback_batch``), which forced an
O(B·R·C) device→host transfer of packed planes before any alignment
string could be built — ~166 MB for a 4096×400×400 batch against
~0.8 MB of actual walk information.  This module walks all B planes in
parallel ON the device: one ``lax.scan`` whose every step gathers one
direction per problem, advances the (y, x) cursors branchlessly, and
records the 2-bit step stream.  Only the packed streams, lengths, and
end cells leave the device; the host reconstructs the aligned strings
arithmetically from the step stream (cumulative-sum cursor replay — no
plane access at all).

Walk semantics are exactly the reference's (stop at Beginning; per-step
emission per simple/mod.rs:107-127/220-242 for pairs and
pwm/mod.rs:81-103 for PWM), pinned bit-identical to the host walker by
tests/test_device_walk.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TOP, LEFT, DIAG, BEG = 0, 1, 2, 3
BLANK = np.int16(98)


@partial(jax.jit, static_argnames=("S", "fmt", "mode", "C", "W1"))
def _walk_device(flat, sy, sx, *, S, fmt, mode, C, W1):
    """Walk B planes for S steps.

    ``flat``: per-problem flattened directions — ``fmt="packed"``: the
    problem-major 2-bit word stream of the pallas fills reshaped to
    (B, R8·C) int32, word index (y-1)//8·C + (x-1), code at bit
    2·((y-1)%8); ``fmt="dense"``: a (B, (R+1)·(W1)) uint8 bordered
    plane (the lax fills).  ``mode`` only matters for ``packed`` border
    synthesis: global borders are Left/Top (simple/mod.rs:61-66), local
    and pwm borders are all Beginning.

    Returns (steps_packed (ceil(S/16), B) int32 — 16 two-bit codes per
    word, Beginning-padded; n walked steps; end_y; end_x).
    """
    B = flat.shape[0]

    def step(carry, _):
        y, x, n, done = carry
        if fmt == "packed":
            r = y - 1
            c = x - 1
            idx = jnp.clip((r >> 3) * C + c, 0, flat.shape[1] - 1)
            w = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
            d = (w >> ((r & 7) * 2)) & 3
            if mode == "global":
                d = jnp.where(
                    y == 0,
                    jnp.where(x >= 1, LEFT, BEG),
                    jnp.where(x == 0, jnp.where(y >= 1, TOP, BEG), d),
                )
            else:
                d = jnp.where((y < 1) | (x < 1), BEG, d)
        else:
            idx = jnp.clip(y * W1 + x, 0, flat.shape[1] - 1)
            d = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
            d = d.astype(jnp.int32)
        d = jnp.where(done, BEG, d)
        act = d != BEG
        up = (d == TOP) | (d == DIAG)
        lf = (d == LEFT) | (d == DIAG)
        return (
            y - up.astype(y.dtype),
            x - lf.astype(x.dtype),
            n + act.astype(n.dtype),
            done | ~act,
        ), d.astype(jnp.int32)

    sy = jnp.asarray(sy, jnp.int32)
    sx = jnp.asarray(sx, jnp.int32)
    init = (sy, sx, jnp.zeros(B, jnp.int32), jnp.zeros(B, bool))
    (ey, ex, n, _), ds = jax.lax.scan(step, init, None, length=S)
    # pack 16 codes per int32 word (BEG padding beyond S is masked by n)
    S16 = -(-S // 16) * 16
    ds = jnp.pad(ds, ((0, S16 - S), (0, 0)), constant_values=BEG)
    ds = ds.reshape(S16 // 16, 16, B)
    shifts = (jnp.arange(16, dtype=jnp.int32) * 2)[None, :, None]
    packed = (ds << shifts).sum(axis=1).astype(jnp.int32)
    return packed, n, ey, ex


def _unpack_steps(packed: np.ndarray, S: int) -> np.ndarray:
    """(ceil(S/16), B) int32 → (S, B) uint8 step codes."""
    k = np.arange(16, dtype=np.int32) * 2
    d = (packed[:, None, :] >> k[None, :, None]) & 3
    return d.reshape(-1, packed.shape[1])[:S].astype(np.uint8)


def walk_batch(dirs_dev, fmt: str, mode: str, sy, sx, R: int, C: int):
    """Run the device walk over B planes and return host-side
    (steps (S, B) uint8, lens, end_y, end_x).

    ``dirs_dev``: the fill's device output — packed words (B, R8, C)
    int32 or a dense (B, R+1, C+1) uint8 plane.  ``R``/``C`` are the
    interior plane dims (padded batch shapes).
    """
    S = R + C + 1
    B = dirs_dev.shape[0]
    flat = dirs_dev.reshape(B, -1)
    W1 = C + 1 if fmt == "dense" else 0
    packed, n, ey, ex = _walk_device(
        flat, np.asarray(sy, np.int32), np.asarray(sx, np.int32),
        S=S, fmt=fmt, mode=mode, C=C, W1=W1,
    )
    return (
        _unpack_steps(np.asarray(packed), S),
        np.asarray(n),
        np.asarray(ey),
        np.asarray(ex),
    )


def _cursor_replay(d: np.ndarray, sy: int, sx: int):
    """(y, x) cursor positions BEFORE each step, from the step stream."""
    up = (d == TOP) | (d == DIAG)
    lf = (d == LEFT) | (d == DIAG)
    y_at = sy - np.concatenate(([0], np.cumsum(up[:-1])))
    x_at = sx - np.concatenate(([0], np.cumsum(lf[:-1])))
    return y_at, x_at


def decode_pair(steps, lens, sy, sx, b: int, q: np.ndarray, t: np.ndarray):
    """Aligned char arrays (already reversed into alignment order, seed
    NOT included — the callers append it) for problem ``b``, matching
    native.traceback_batch's per-walk output bit for bit."""
    d = steps[: lens[b], b]
    y_at, x_at = _cursor_replay(d, int(sy[b]), int(sx[b]))
    qa = np.where(d == TOP, BLANK, q[x_at - 1]).astype(np.int16)
    ta = np.where(d == LEFT, BLANK, t[y_at - 1]).astype(np.int16)
    return qa[::-1], ta[::-1]


def _cursor_replay_all(d: np.ndarray, sy, sx):
    """All-problems cursor replay: (y, x) positions BEFORE each step for
    the whole (S, B) step array at once (two cumsums instead of 2·B)."""
    up = (d == TOP) | (d == DIAG)
    lf = (d == LEFT) | (d == DIAG)
    z = np.zeros((1, d.shape[1]), np.int64)
    y_at = np.asarray(sy, np.int64)[None, :] - np.concatenate(
        [z, np.cumsum(up[:-1], axis=0, dtype=np.int64)]
    )
    x_at = np.asarray(sx, np.int64)[None, :] - np.concatenate(
        [z, np.cumsum(lf[:-1], axis=0, dtype=np.int64)]
    )
    return y_at, x_at


def decode_pair_batch(steps, lens, sy, sx, q: np.ndarray, t: np.ndarray):
    """Vectorized :func:`decode_pair` over ALL B problems in one pass.

    ``q``/``t`` are the padded (B, L) code arrays.  Returns two lists of
    per-problem arrays, bit-identical to calling ``decode_pair`` per b
    (pinned by tests/test_device_walk.py) — the cumsums and gathers run
    once over the (S, B) stream instead of B Python iterations
    (simple/mod.rs:99-127 traceback at batch scale)."""
    y_at, x_at = _cursor_replay_all(steps, sy, sx)
    # clip only guards rows past lens[b] (sliced off below); real steps
    # never gather out of range (a consuming step has cursor >= 1)
    qi = np.clip(x_at - 1, 0, q.shape[1] - 1)
    ti = np.clip(y_at - 1, 0, t.shape[1] - 1)
    qa_all = np.where(
        steps == TOP, BLANK, np.take_along_axis(q.T, qi, axis=0)
    ).astype(np.int16)
    ta_all = np.where(
        steps == LEFT, BLANK, np.take_along_axis(t.T, ti, axis=0)
    ).astype(np.int16)
    return (
        [qa_all[: lens[b], b][::-1] for b in range(steps.shape[1])],
        [ta_all[: lens[b], b][::-1] for b in range(steps.shape[1])],
    )


def decode_pwm(steps, lens, sy, sx, b: int, q: np.ndarray):
    """PWM-mode decode: ``numbered`` gets the pwm position (0 for gaps),
    qa the query char / BLANK (an_traceback pwm_mode semantics)."""
    d = steps[: lens[b], b]
    y_at, x_at = _cursor_replay(d, int(sy[b]), int(sx[b]))
    qa = np.where(d == LEFT, BLANK, q[y_at - 1]).astype(np.int16)
    numbered = np.where(d == TOP, 0, x_at).astype(np.int32)
    return qa[::-1], numbered[::-1]


def decode_pwm_batch(steps, lens, sy, sx, q: np.ndarray):
    """Vectorized :func:`decode_pwm` over ALL B problems (``q`` is the
    padded (B, L) code array); bit-identical per-problem output."""
    y_at, x_at = _cursor_replay_all(steps, sy, sx)
    qi = np.clip(y_at - 1, 0, q.shape[1] - 1)
    qa_all = np.where(
        steps == LEFT, BLANK, np.take_along_axis(q.T, qi, axis=0)
    ).astype(np.int16)
    num_all = np.where(steps == TOP, 0, x_at).astype(np.int32)
    return (
        [qa_all[: lens[b], b][::-1] for b in range(steps.shape[1])],
        [num_all[: lens[b], b][::-1] for b in range(steps.shape[1])],
    )
