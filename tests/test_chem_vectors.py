"""Compound-hash and sanitization vector tests (X3/X4/X16).

Mirrors the reference's hash vectors (tests/test_unit/test_utils.py:18-49):
under RDKit the exact published hashes must reproduce; under the fake
backend the deterministic fake vectors are pinned so any drift in identity
semantics (hash input block, type prefix, inchi_blocks slicing) is caught.
No Spark session needed — pure driver-side chemistry.
"""

from __future__ import annotations

import pytest

from mine_database_spark.chem import compound_hash, get_backend

GLUCOSE = "C([C@@H]1[C@H]([C@@H]([C@H]([C@H](O1)O)O)O)O)O"

backend = get_backend()
is_rdkit = backend.name == "rdkit"


# ---------------------------------------------------------------------------
# reference vectors (verbatim from test_utils.py:18-49) — run under rdkit


@pytest.mark.skipif(not is_rdkit, reason="rdkit not installed")
def test_reference_hash_vectors_rdkit():
    assert compound_hash("CCO", "Coreactant") == (
        "Xa41fe8492d86f214ba494e3d04da2f0854c0e2ea",
        "LFQSCWFLJHTTHZ",
    )
    assert compound_hash("CCO", "Predicted") == (
        "Ca41fe8492d86f214ba494e3d04da2f0854c0e2ea",
        "LFQSCWFLJHTTHZ-UHFFFAOYSA-N",
    )
    assert compound_hash("CCO", "Starting Compound") == (
        "Ca41fe8492d86f214ba494e3d04da2f0854c0e2ea",
        "LFQSCWFLJHTTHZ-UHFFFAOYSA-N",
    )
    assert compound_hash(GLUCOSE, "Starting Compound", inchi_blocks=2) == (
        "Cf95a3c17f908e427c3127b4e8c3d8575c286d6ce",
        "WQZGKKKJIJFFOK-DVKNGEFBSA-N",
    )
    assert compound_hash(GLUCOSE, "Starting Compound", inchi_blocks=1) == (
        "C9ab1a08d72c90a8167d1f3a668d8f1138e534a07",
        "WQZGKKKJIJFFOK-DVKNGEFBSA-N",
    )


# ---------------------------------------------------------------------------
# fake-backend vectors — same contract, deterministic stand-in chemistry


@pytest.mark.skipif(is_rdkit, reason="fake-backend vectors")
def test_fake_hash_vectors():
    assert compound_hash("CCO", "Coreactant") == (
        "Xaa0e88f6a3274dd019c630099e467933771b84e4",
        "ABDEEDEDFEDECF",
    )
    assert compound_hash("CCO", "Predicted") == (
        "Caa0e88f6a3274dd019c630099e467933771b84e4",
        "ABDEEDEDFEDECF-AFFFCCFDAB-N",
    )
    # Starting Compound hashes identically to Predicted (C prefix) — the
    # reference's vectors pin exactly this equivalence
    assert compound_hash("CCO", "Starting Compound")[0] == compound_hash("CCO", "Predicted")[0]
    assert compound_hash(GLUCOSE, "Starting Compound", inchi_blocks=1) == (
        "Ccde7e20d8408a9dfe537a6767add94b40b278c50",
        "DBAFEDEAECDBDD-BAAFDDDBDC-N",
    )
    # two blocks hash a longer InChIKey prefix → different id, same key
    assert compound_hash(GLUCOSE, "Starting Compound", inchi_blocks=2) == (
        "C5d62deaf2afdad9b213183b375fd51076a889da0",
        "DBAFEDEAECDBDD-BAAFDDDBDC-N",
    )


def test_wildcard_smiles_hashes_raw_string():
    """'*' (R-group) molecules have no InChI — the reference hashes the raw
    SMILES and returns no key (utils.py:143-151). Backend-independent."""
    cid, key = compound_hash("C*CO", "Predicted")
    import hashlib

    assert cid == "C" + hashlib.sha1(b"C*CO").hexdigest()
    assert key is None


# ---------------------------------------------------------------------------
# sanitization semantics (X3/X4)


def test_neutralize_fixpoint_idempotent():
    s = backend.neutralize("a+b-c+")
    assert backend.neutralize(s) == s
    assert "+" not in s and "-" not in s


def test_postsanitize_sorted_first_is_canonical():
    """The canonical tautomer is the lexicographically first of the sorted
    candidate set — the reference's postsanitize_smiles([s])[0][0]."""
    all_t = backend.postsanitize_all("anhbhnc" if not is_rdkit else "c1ccc2[nH]cnc2c1")
    assert all_t == sorted(all_t)
    assert backend.postsanitize("anhbhnc" if not is_rdkit else "c1ccc2[nH]cnc2c1") == all_t[0]


@pytest.mark.skipif(is_rdkit, reason="fake tautomer enumeration")
def test_fake_tautomer_enumeration():
    # each nh/hn digram is one shift site: original + 2 single-site swaps
    assert backend.postsanitize_all("anhbhnc") == ["ahnbhnc", "anhbhnc", "anhbnhc"]
    assert backend.postsanitize("xnhy") == "xhny"
    # canonical choice is stable (idempotent)
    assert backend.postsanitize(backend.postsanitize("xnhy")) == "xhny"


@pytest.mark.skipif(not is_rdkit, reason="rdkit only")
def test_rdkit_neutralize_vectors():
    # carboxylate → acid; ammonium → amine (cookbook patterns, utils.py:392-413)
    assert backend.neutralize("CC(=O)[O-]") == "CC(=O)O"
    assert backend.neutralize("C[NH3+]") == "CN"
