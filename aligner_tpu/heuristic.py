"""Heuristic (matrix-free) aligners.

Equivalent of aligner-core/src/heuristic/mod.rs: derive a scoring matrix
iteratively — align locally with a transformed matrix, take the
alignment's substitution-frequency matrix, project it back onto the
(kd, r²) constraint surface, realign — until the local score stops
strictly improving (heuristic/mod.rs:58-77).  The returned result is the
first *non-improving* alignment with the matrix that produced it attached
(heuristic/mod.rs:73-76).

TPU-native addition: :func:`heuristic_align_population` iterates a whole
population of candidate starting matrices as one problem batch (the
aligner-web service ships one Kafka job per matrix, node/main.rs:61-74;
here the population is the batch axis of a single kernel launch per
iteration, with converged problems masked out).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .align import align_local, align_pwm, batch_align
from .alphabet import DNA, Alphabet, Protein
from .errors import MissingArgument, ValidationError
from .matrices import transform_matrix
from .result import AlignmentResult


@dataclasses.dataclass
class Heuristics:
    """Matrix-derivation parameters (lib.rs:21-25)."""

    kd: float
    r_squared: float
    frequencies: np.ndarray


def heuristic_align(
    query,
    target,
    matrix,
    del_: float,
    ext: float,
    heuristics: Heuristics | None,
    *,
    alphabet: type[Alphabet] = Protein,
    backend: str | None = None,
    max_iters: int = 1000,
) -> AlignmentResult:
    """Pairwise heuristic local alignment (heuristic/mod.rs:36-78).

    ``r_squared == 0`` defaults to rows*cols of the seed matrix
    (heuristic/mod.rs:48-50).  ``max_iters`` is a safety bound absent in
    the reference (whose loop is unbounded).
    """
    if heuristics is None:
        raise MissingArgument("heuristic aligner requires Heuristics")
    matrix = np.asarray(matrix, dtype=np.float64)
    r_squared = heuristics.r_squared
    if abs(r_squared) < np.finfo(np.float64).eps:
        r_squared = float(matrix.shape[0] * matrix.shape[1])

    transformed = transform_matrix(
        matrix, heuristics.kd, r_squared, heuristics.frequencies
    )
    if max_iters < 1:
        raise ValidationError("max_iters must be >= 1")
    max_f = 0.0
    for _ in range(max_iters):
        current = transformed  # the matrix THIS iteration aligns with
        result = align_local(
            query, target, current, del_, ext,
            alphabet=alphabet, backend=backend,
        )
        if result.alignment.f > max_f:
            max_f = result.alignment.f
            transformed = transform_matrix(
                result.alignment.frequency_matrix(),
                heuristics.kd, r_squared, heuristics.frequencies,
            )
        else:
            result.matrix = current
            return result
    # max_iters exhausted while still improving: attach the matrix that
    # PRODUCED the returned alignment (not the freshly transformed one)
    result.matrix = current
    return result


def heuristic_align_pwm(
    query,
    pwm,
    del_: float,
    ext: float,
    heuristics: Heuristics | None,
    *,
    alphabet: type[Alphabet] = DNA,
    backend: str | None = None,
    max_iters: int = 1000,
) -> AlignmentResult:
    """Query-vs-PWM heuristic alignment (heuristic/mod.rs:103-141).

    Note the PWM variant does *not* apply the r_squared==0 default.
    """
    if heuristics is None:
        raise MissingArgument("heuristic aligner requires Heuristics")
    pwm = np.asarray(pwm, dtype=np.float64)
    transformed = transform_matrix(
        pwm, heuristics.kd, heuristics.r_squared, heuristics.frequencies
    )
    if max_iters < 1:
        raise ValidationError("max_iters must be >= 1")
    max_f = 0.0
    for _ in range(max_iters):
        current = transformed
        result = align_pwm(
            query, current, del_, ext, alphabet=alphabet, backend=backend
        )
        if result.alignment.f > max_f:
            max_f = result.alignment.f
            transformed = transform_matrix(
                result.alignment.frequency_matrix(),
                heuristics.kd, heuristics.r_squared, heuristics.frequencies,
            )
        else:
            result.matrix = current
            return result
    result.matrix = current
    return result


def heuristic_align_population(
    query,
    target,
    matrices: np.ndarray,  # (M, V, V) candidate starting matrices
    del_: float,
    ext: float,
    heuristics: Heuristics | None,
    *,
    alphabet: type[Alphabet] = Protein,
    backend: str | None = None,
    max_iters: int = 1000,
) -> list[AlignmentResult]:
    """Run the heuristic loop for a whole matrix population at once.

    One batched kernel launch per iteration covers every still-improving
    candidate, following :func:`heuristic_align`'s iteration rule per
    member.  NOTE the engines differ at the margin: this path always
    runs the batched device fill (default dtype), while single-pair
    heuristic_align may route small problems to the f64 host engine —
    heuristic-transformed matrices are non-integral, so f32 ties can
    resolve differently there (pass ``dtype=jnp.float64`` on CPU for
    strict agreement).  Returns one AlignmentResult per input matrix
    (with ``.matrix`` set).

    A member whose transformed matrix admits NO positive-scoring cell
    has no local alignment; its entry is ``None`` (the reference would
    panic the whole process on the 0-index traceback seed there,
    simple/mod.rs:213-218 — one dead candidate must not take down the
    other M-1).
    """
    if heuristics is None:
        raise MissingArgument("heuristic aligner requires Heuristics")
    matrices = np.asarray(matrices, dtype=np.float64)
    M = matrices.shape[0]
    r_squared = heuristics.r_squared
    if abs(r_squared) < np.finfo(np.float64).eps:
        r_squared = float(matrices.shape[1] * matrices.shape[2])

    transformed = np.stack(
        [
            transform_matrix(matrices[m], heuristics.kd, r_squared, heuristics.frequencies)
            for m in range(M)
        ]
    )
    max_f = np.zeros(M)
    results: list[AlignmentResult | None] = [None] * M
    # constant-shape iteration: converged problems are masked inactive
    # (zero-length — effectively free) instead of shrinking the batch, so
    # every iteration reuses one compiled kernel
    done = np.zeros(M, bool)
    dead = np.zeros(M, bool)  # members whose matrix admits no alignment

    from .align import _encode

    q = _encode(query, alphabet)
    t = _encode(target, alphabet)

    for _ in range(max_iters):
        if done.all():
            break
        batch = batch_align(
            [q] * M, [t] * M, transformed,
            del_, ext, mode="local", alphabet=alphabet,
            backend=backend, with_alignments=True, skip=done,
        )
        for m, res in enumerate(batch):
            if res is None:
                if not done[m]:
                    # no positive-scoring cell under the current
                    # matrix: dead member (docstring) — retire it so it
                    # doesn't force every remaining iteration
                    dead[m] = True
                    done[m] = True
                continue
            if res.alignment.f > max_f[m]:
                max_f[m] = res.alignment.f
                transformed[m] = transform_matrix(
                    res.alignment.frequency_matrix(),
                    heuristics.kd, r_squared, heuristics.frequencies,
                )
            else:
                res.matrix = transformed[m].copy()
                results[m] = res
                done[m] = True
    pending = np.array(
        [results[m] is None and not dead[m] for m in range(M)], bool
    )
    if pending.any():
        # hit max_iters while still improving: attach current state via
        # ONE more masked M-wide launch (constant compiled shape —
        # per-member batch-1 launches would each compile a fresh kernel)
        batch = batch_align(
            [q] * M, [t] * M, transformed, del_, ext, mode="local",
            alphabet=alphabet, backend=backend, with_alignments=True,
            skip=~pending,
        )
        for m in np.flatnonzero(pending):
            res = batch[m]
            if res is None:
                continue  # dead member (docstring): stays None
            res.matrix = transformed[m].copy()
            results[m] = res
    return results  # type: ignore[return-value]


# --- class wrappers mirroring the reference API ---


class HeuristicAligner:
    """Equivalent of aligner-core HeuristicAligner (heuristic/mod.rs:10-79)."""

    def __init__(self, query, target, alphabet=Protein):
        self.query = query
        self.target = target
        self.alphabet = alphabet

    @classmethod
    def from_str_seqs(cls, query: str, target: str, alphabet=Protein):
        return cls(alphabet.encode(query, strict=True),
                   alphabet.encode(target, strict=True), alphabet)

    @classmethod
    def from_seqs(cls, query, target, alphabet=Protein):
        return cls(np.asarray(query, np.int8), np.asarray(target, np.int8), alphabet)

    def perform_alignment(self, del_, ext, matrix, heuristics=None, **kw):
        return heuristic_align(
            self.query, self.target, matrix, del_, ext, heuristics,
            alphabet=self.alphabet, **kw,
        )


class HeuristicPWMAligner:
    """Equivalent of aligner-core HeuristicPWMAligner (heuristic/mod.rs:81-142)."""

    def __init__(self, query, alphabet=DNA):
        self.query = query
        self.alphabet = alphabet

    @classmethod
    def from_str_seqs(cls, query: str, alphabet=DNA):
        return cls(alphabet.encode(query), alphabet)

    @classmethod
    def from_seqs(cls, query, alphabet=DNA):
        return cls(np.asarray(query, np.int8), alphabet)

    def perform_alignment(self, del_, ext, pwm, heuristics=None, **kw):
        return heuristic_align_pwm(
            self.query, pwm, del_, ext, heuristics, alphabet=self.alphabet, **kw
        )
