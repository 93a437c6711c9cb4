"""Frozen golden fixtures for the example FASTAs.

tests/fixtures/examples_golden.json was generated once from the Python
oracle (which is itself pinned to the reference's golden matrices in
test_oracle_golden.py) and committed.  Engines are checked against these
*static* values so a regression in the oracle itself cannot silently
re-baseline everything.
"""

import json
import pathlib

import pytest

import aligner_tpu as at
from aligner_tpu.io import read_fasta_file

FIXTURES = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "examples_golden.json").read_text()
)


def _norm_coords(c):
    return tuple(tuple(x) for x in c)


@pytest.mark.parametrize("example", sorted(FIXTURES))
@pytest.mark.parametrize("backend", ["oracle", "xla"])
def test_examples_match_frozen_goldens(example, backend):
    recs = read_fasta_file(f"examples/{example}.fasta")
    q = at.Protein.encode(recs[0].seq, strict=True)
    t = at.Protein.encode(recs[1].seq, strict=True)
    for key, want in FIXTURES[example].items():
        mode, d, e = key.split("_")
        d = float(d[1:])
        e = float(e[1:])
        if backend == "xla" and example == "human_gene_example":
            continue  # covered by the slow plane-identity test
        fn = at.align_local if mode == "local" else at.align_global
        r = fn(q, t, at.blosum62(), d, e, backend=backend)
        assert r.alignment.f == want["f"], key
        assert _norm_coords(r.alignment.coords) == _norm_coords(want["coords"]), key
        assert at.Protein.decode(r.alignment.query) == want["query"], key
        assert at.Protein.decode(r.alignment.target) == want["target"], key
