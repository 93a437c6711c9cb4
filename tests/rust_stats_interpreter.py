"""Literal statement-for-statement transcription of the reference's
statistics ML fit (aligner-core/src/statistics/mod.rs:36-238), written
*independently* of aligner_tpu.statistics as a cross-check oracle.

Every Rust statement maps to one numpy statement in source order; the
only liberties taken are numpy arrays for ndarray Array1 and
np.errstate to reproduce Rust f64's non-raising inf/nan semantics.
Loop structure, binding shadowing, and branch order are transcribed
verbatim so a transcription error in the production module (which is
reorganized/vectorized differently) cannot be replicated here by
construction.
"""

from __future__ import annotations

import numpy as np

THRESHOLD_GLOBAL = 1e-6
THRESHOLD_LOCAL = 1e-4


def estimate_k_and_lambda_by_parameters(
    query_length, target_lengths, scores, old_k, old_lambda, h, maxiter
):
    """statistics/mod.rs:125-189."""
    with np.errstate(all="ignore"):
        k = np.float64(old_k)
        lambda_ = np.float64(old_lambda)
        n = np.float64(len(target_lengths))
        q = np.float64(query_length)
        t = target_lengths.astype(np.float64)

        # mod.rs:138-142
        l = np.log(k * q * t) / h
        nn_array = (q - l) * (t - l)

        # mod.rs:144-146
        exponential_scores = np.exp(-lambda_ * scores)
        sum_ = (nn_array * exponential_scores).sum()
        weighted_sum = (nn_array * scores * exponential_scores).sum()

        for _i in range(maxiter + 1):  # mod.rs:148 `for i in 0..=MAXITER`
            # mod.rs:149-152
            lambda_f = np.float64(1.0) / lambda_ - scores.sum() / n \
                + weighted_sum / sum_
            # lambda.powi(-2) lowers to 1/(λ·λ) and .powi(2) to u·u
            # (LLVM powi is expanded to multiplies, not libm pow)
            ws_over_sum = weighted_sum / sum_
            lambda_fd = (
                -(np.float64(1.0) / (lambda_ * lambda_))
                - (nn_array * (scores * scores) * exponential_scores).sum() / sum_
                + ws_over_sum * ws_over_sum
            )

            if not (np.isfinite(lambda_f) and np.isfinite(lambda_fd)):
                return float(k), float(lambda_)  # mod.rs:154-156

            new_lambda = lambda_ - lambda_f / lambda_fd  # mod.rs:158

            # mod.rs:160-162 — recomputed before lambda is updated
            exponential_scores = np.exp(-lambda_ * scores)
            sum_ = (nn_array * exponential_scores).sum()
            weighted_sum = (nn_array * scores * exponential_scores).sum()

            new_k = n / sum_  # mod.rs:164

            if not np.isfinite(new_k) or new_k <= 0.0:
                return float(k), float(lambda_)  # mod.rs:166-168

            k = new_k  # mod.rs:170
            lambda_ = new_lambda  # mod.rs:171

            if abs(lambda_f) < THRESHOLD_LOCAL:
                return float(k), float(lambda_)  # mod.rs:177-179

            # mod.rs:181-185
            l = np.log(k * q * t) / h
            nn_array = (q - l) * (t - l)

        return float(k), float(lambda_)  # mod.rs:188


def estimate_h_by_parameters(
    query_length, target_lengths, scores, k, lambda_, old_h, maxiter
):
    """statistics/mod.rs:191-238."""
    with np.errstate(all="ignore"):
        h = np.float64(old_h)
        q = np.float64(query_length)
        t = target_lengths.astype(np.float64)
        k = np.float64(k)
        lambda_ = np.float64(lambda_)

        for _i in range(maxiter + 1):  # mod.rs:201
            # mod.rs:202-210
            l_array = np.log(k * q * t) / h
            nn_array = (q - l_array) * (t - l_array)
            a_array = 2.0 * l_array - q - t
            b_array = 1.0 / nn_array - k * np.exp(-lambda_ * scores)
            c_array = -l_array / h

            # mod.rs:212-216
            h_g = (a_array * b_array * c_array).sum()
            # mod.rs:214 squares via mapv(|u| u * u) — self-multiply
            u_array = a_array * c_array / nn_array
            h_gd = (
                2.0 * b_array * (c_array * c_array)
                - u_array * u_array
                - 2.0 * a_array * b_array * c_array / h
            ).sum()

            if abs(h_g) < THRESHOLD_LOCAL:
                return float(h)  # mod.rs:218-220

            # mod.rs:222-232
            if h_gd > 0.0:
                if h_g > 0.0:
                    h = h * 2.0
                else:
                    h = h / 2.0
            elif h_g <= 0.0:
                h = h / 2.0
            else:
                h = h - h_g / h_gd

        return float(h)  # mod.rs:237


def calculate_distribution_params(
    query_length, target_lengths, scores, maxiter=10000
):
    """statistics/mod.rs:36-123.  Returns (k, lambda, h)."""
    target_lengths = np.asarray(target_lengths)
    scores = np.asarray(scores, np.float64)
    assert len(scores) == len(target_lengths)  # mod.rs:41-43

    with np.errstate(all="ignore"):
        # mod.rs:45-48 ndarray central_moment(2) = (1/n)·Σ(x − mean)²
        sd = ((scores - scores.mean()) ** 2).mean()

        lambda_ = np.float64(1.0) / sd  # mod.rs:50
        h = np.float64(1.0)  # mod.rs:51
        n = np.float64(len(target_lengths))  # mod.rs:53
        q = np.float64(query_length)

        # mod.rs:55 — plain q·t, NOT edge-corrected
        nn_array = (target_lengths * query_length).astype(np.float64)

        # mod.rs:57
        k = n / (nn_array * np.exp(-lambda_ * scores)).sum()

        # mod.rs:59-63 — natural log here
        log_likelihood = n * np.log(lambda_ * k) + (
            np.log(nn_array) - lambda_ * scores
            - k * nn_array * np.exp(-lambda_ * scores)
        ).sum()

        active_target_lengths = target_lengths.copy()  # mod.rs:65
        active_scores = scores.copy()  # mod.rs:66

        for _ in range(maxiter + 1):  # mod.rs:68
            # mod.rs:69-76 — `let (k, lambda)` SHADOWS the outer bindings:
            # every iteration restarts from the initial k/lambda above
            k_i, lambda_i = estimate_k_and_lambda_by_parameters(
                query_length, active_target_lengths, active_scores,
                k, lambda_, h, maxiter,
            )

            h = estimate_h_by_parameters(  # mod.rs:78-85
                query_length, active_target_lengths, active_scores,
                k_i, lambda_i, h, maxiter,
            )

            # mod.rs:87-91 — over ALL target lengths, with the inner k
            tl_f = target_lengths.astype(np.float64)
            l = np.log(k_i * q * tl_f) / h
            nn_array = (q - l) * (tl_f - l)

            # mod.rs:93-97 — log10 here (vs ln in the init)
            log_likelihood_new = n * np.log10(lambda_i * k_i) + (
                np.log10(nn_array) - lambda_i * scores
                - k_i * nn_array * np.exp(-lambda_i * scores)
            ).sum()

            # mod.rs:99-101 — SIGNED denominator (negative ll → instant
            # convergence)
            if abs(log_likelihood_new - log_likelihood) / log_likelihood \
                    < THRESHOLD_GLOBAL:
                return float(k_i), float(lambda_i), float(h)

            log_likelihood = log_likelihood_new  # mod.rs:103

            # mod.rs:105-119 — outlier filter over ALL scores
            keep = n * (
                1.0 - np.exp(-k_i * nn_array * np.exp(-lambda_i * scores))
            ) >= 1.0
            active_target_lengths = target_lengths[keep]
            active_scores = scores[keep]

        # mod.rs:122 — the OUTER (initial) k and lambda with the final h
        return float(k), float(lambda_), float(h)


def get_p_value(k, lambda_, h, query_length, target_length, score):
    """statistics/mod.rs:23-33."""
    with np.errstate(all="ignore"):
        l = np.log(np.float64(k) * query_length * target_length) / h
        nn = (query_length - l) * (target_length - l)
        return float(
            1.0 - np.exp(-k * nn * np.exp(-np.float64(lambda_) * score))
        )
