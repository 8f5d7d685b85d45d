"""Twin-equivalence for the two engine-native-hash production entries
(round-3 VERDICT "Next round" item 7).

`minhash_lsh_documents` (xxhash64) and `embedding_near_dup` (engine
random hyperplanes) cannot hash-match a DuckDB oracle — their hash
families are not portable — so the driver records them rows-only. Each
has an oracle-checked twin running the SAME pipeline on a portable
hash family (`minhash_lsh_md5_documents`, `embedding_near_dup_planes`).
These tests pin the production modes to their verified twins so they
are not merely "runs":

- the VERIFIED pair set is identical between production mode and twin
  (the verify stage — est_jaccard threshold / exact cosine — depends
  on the data, not the hash family; only candidate GENERATION does);
- the minhash production pair set covers every exact-jaccard pair
  (ngram_jaccard_pairs is the exact ground truth the oracle checks).

Everything is deterministic (seeded hash families, no RNG), so set
equality is a stable assertion, not a flaky recall bound.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q():
    return entry.queries()


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_minhash_production_matches_md5_twin(spark, q):
    prod = _pairs(q["minhash_lsh_documents"](spark, SF))
    twin = _pairs(q["minhash_lsh_md5_documents"](spark, SF))
    assert prod, "production minhash returned no pairs — vacuous test"
    assert prod == twin


def test_minhash_production_covers_exact_jaccard(spark, q):
    prod = _pairs(q["minhash_lsh_documents"](spark, SF))
    exact = _pairs(q["ngram_jaccard_documents"](spark, SF))
    assert exact, "exact-jaccard ground truth empty — vacuous test"
    assert exact <= prod


def test_embedding_near_dup_production_matches_planes_twin(spark, q):
    prod = _pairs(q["embedding_near_dup"](spark, SF))
    twin = _pairs(q["embedding_near_dup_planes"](spark, SF))
    assert prod, "production near-dup returned no pairs — vacuous test"
    assert prod == twin


def test_embedding_near_dup_recovers_planted(spark, q):
    """Both modes must return exactly the 40 planted (source, copy)
    pairs — the exact-cosine verify keeps nothing else at min 0.95
    on random unit vectors."""
    prod = _pairs(q["embedding_near_dup"](spark, SF))
    assert prod == {(v, v + 100000) for v in range(40)}
