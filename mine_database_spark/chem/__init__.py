"""Pluggable chemistry backend.

The reference does all chemistry with RDKit (compiled SMARTS reactions,
InChIKey identity, descriptors). This container has no RDKit, so the engine
runs against a deterministic fake backend with the same interface: molecules
are opaque strings, rules are substring rewrites, descriptors are stable
hash-derived numbers. Every Spark-side contract (schemas, hashing, merge
semantics, filter/prune relational logic) is identical under either backend;
swap in the RDKit backend by installing rdkit — selection is automatic.
"""

from __future__ import annotations


def compound_hash(
    smiles: str, cpd_type: str = "Predicted", inchi_blocks: int = 1, backend=None
) -> tuple[str | None, str | None]:
    """Reference get_compound_hash (utils.py:115-164): type-prefixed sha1 of
    the first `inchi_blocks` blocks of the InChIKey — or of the raw SMILES
    when it contains '*' (R-group wildcards have no InChI). Coreactants
    return the hashed block as the second element, others the full key."""
    import hashlib

    if backend is None:
        backend = get_backend()
    inchi_key = None
    if "*" not in (smiles or ""):
        inchi_key = backend.inchi_key(smiles)
        if not inchi_key:
            return None, None
        block = inchi_key.rsplit("-", 3 - inchi_blocks)[0]
    else:
        block = smiles
    chash = hashlib.sha1(block.encode("utf-8")).hexdigest()
    if cpd_type == "Coreactant":
        return "X" + chash, block
    if cpd_type == "Target Compound":
        return "T" + chash, inchi_key
    return "C" + chash, inchi_key


def get_backend():
    try:
        from mine_database_spark.chem import rdkit_backend  # noqa: F401

        return rdkit_backend.RDKitBackend()
    except ImportError:
        from mine_database_spark.chem.fake import FakeChemBackend

        return FakeChemBackend()
