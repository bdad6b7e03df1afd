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


def get_backend():
    try:
        from mine_database_spark.chem import rdkit_backend  # noqa: F401

        return rdkit_backend.RDKitBackend()
    except ImportError:
        from mine_database_spark.chem.fake import FakeChemBackend

        return FakeChemBackend()
