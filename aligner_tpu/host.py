"""Host (CPU) alignment engine: native C++ scalar fill with Python-oracle
fallback.

The ``oracle`` backend routes here: the C++ fill (native.py) implements
the same IEEE-754 double operations in the same order as the pure-Python
oracle, so results are bit-identical (tests cross-validate); it is simply
~1000x faster, which makes single-pair alignment of chromosome-scale
sequences practical on the host.  The short data-dependent traceback walk
stays in Python (oracle._walk).
"""

from __future__ import annotations

import numpy as np

from . import native, oracle
from .errors import MatrixShapeError, ResultIsEmpty
from .oracle import OracleResult, _walk, argmax_first_rowmajor


def align_local(q, t, matrix, del_: float, ext: float) -> OracleResult:
    if len(q) == 0 or len(t) == 0:
        raise ResultIsEmpty("empty sequence")
    if not native.available():
        return oracle.align_local(q, t, matrix, del_, ext)
    plane, dirs = native.fill(q, t, matrix, del_, ext, "local")
    my, mx = native.argmax_first_rowmajor(plane)
    if my == 0 or mx == 0:
        raise ResultIsEmpty("local alignment has no positive-scoring cell")
    qa = [int(q[mx - 1])]
    ta = [int(t[my - 1])]
    cy, cx = _walk(dirs, my, mx, q, t, qa, ta, pwm_mode=False)
    qa.reverse()
    ta.reverse()
    return OracleResult(
        score=plane, directions=dirs,
        query_aligned=np.array(qa, dtype=np.int16),
        target_aligned=np.array(ta, dtype=np.int16),
        coords=((cx + 1, mx + 1), (cy + 1, my + 1)),
        f=float(plane.max()),
    )


def align_global(q, t, matrix, del_: float, ext: float) -> OracleResult:
    if len(q) == 0 or len(t) == 0:
        raise ResultIsEmpty("empty sequence")
    if not native.available():
        return oracle.align_global(q, t, matrix, del_, ext)
    plane, dirs = native.fill(q, t, matrix, del_, ext, "global")
    qa = [int(q[-1])]
    ta = [int(t[-1])]
    _walk(dirs, len(t), len(q), q, t, qa, ta, pwm_mode=False)
    qa.reverse()
    ta.reverse()
    return OracleResult(
        score=plane, directions=dirs,
        query_aligned=np.array(qa, dtype=np.int16),
        target_aligned=np.array(ta, dtype=np.int16),
        coords=((1, len(q)), (1, len(t))),
        f=0.0,
    )


def align_pwm(q, pwm, del_: float, ext: float) -> OracleResult:
    pwm = np.asarray(pwm)
    if pwm.shape[0] != 4:
        raise MatrixShapeError(f"PWM must have 4 rows, got {pwm.shape[0]}")
    if not native.available():
        return oracle.align_pwm(q, pwm, del_, ext)
    plane, dirs = native.fill(q, None, pwm, del_, ext, "pwm")
    my, mx = argmax_first_rowmajor(plane)
    qa: list[int] = []
    ta: list[int] = []
    cy, cx = _walk(dirs, my, mx, q, None, qa, ta, pwm_mode=True)
    qa.reverse()
    ta.reverse()
    return OracleResult(
        score=plane, directions=dirs,
        query_aligned=np.array(qa, dtype=np.int16),
        target_aligned=np.array(ta, dtype=np.int16),
        coords=((cx + 1, mx + 1), (cy + 1, my + 1)),
        f=float(plane.max()),
    )
