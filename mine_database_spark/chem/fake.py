"""Deterministic fake chemistry backend.

Implements the same surface the reference uses RDKit for (see SURVEY §2.10
X1-X7, X17: /root/reference/minedatabase/utils.py:115-164, 385-553,
reactions.py:44-220) with pure-Python deterministic stand-ins so the engine
and its tests run without RDKit:

  * molecule       = arbitrary non-empty string (its own canonical form)
  * inchi key      = sha256-derived, formatted XXXXXXXXXXXXXX-YYYYYYYYYY-N
  * rule "SMARTS"  = 'pat>>repl' substring rewrite; applying a rule to a
                     molecule yields one product set per occurrence of pat
  * descriptors    = stable functions of the character multiset

Everything is pure and stateless → safe inside pandas UDF workers.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter


class FakeChemBackend:
    name = "fake"
    # substring-rewrite "chemistry" does not conserve the letter multiset, so
    # the reference's atom-balance rejection (reactions.py:194-198) would veto
    # nearly every fake reaction; the engine therefore skips the balance check
    # under this backend unless a test opts in with check_balance=True
    conserves_atoms = False

    # --- identity ---------------------------------------------------------
    def canonical_smiles(self, smiles: str) -> str | None:
        s = (smiles or "").strip()
        if not s or "." in s:
            # reference rejects multi-fragment products (reactions.py:142-143)
            return s if s else None
        return s

    def inchi_key(self, smiles: str) -> str | None:
        s = self.canonical_smiles(smiles)
        if not s:
            return None
        h = hashlib.sha256(s.encode()).hexdigest().upper()
        block1 = "".join(c for c in h if c.isalpha())[:14].ljust(14, "A")
        block2 = "".join(c for c in h[::-1] if c.isalpha())[:10].ljust(10, "A")
        return f"{block1}-{block2}-N"

    # --- descriptors ------------------------------------------------------
    def atom_count(self, smiles: str) -> dict[str, int]:
        return dict(Counter(c.upper() for c in (smiles or "") if c.isalpha()))

    def formula(self, smiles: str) -> str:
        counts = self.atom_count(smiles)
        return "".join(f"{el}{n if n > 1 else ''}" for el, n in sorted(counts.items()))

    def exact_mol_wt(self, smiles: str) -> float:
        return round(sum(((ord(c) % 26) + 1) * 1.008 for c in (smiles or "") if c.isalpha()), 6)

    def formal_charge(self, smiles: str) -> int:
        return (smiles or "").count("+") - (smiles or "").count("-")

    def logp(self, smiles: str) -> float:
        h = int(hashlib.md5((smiles or "").encode()).hexdigest()[:8], 16)
        return round((h / 0xFFFFFFFF) * 10 - 5, 4)

    def fingerprint(self, smiles: str, n_bits: int = 512, k: int = 16) -> list[int]:
        bits = set()
        for i in range(k):
            h = int(hashlib.md5(f"{i}:{smiles}".encode()).hexdigest()[:8], 16)
            bits.add(h % n_bits)
        return sorted(bits)

    def neutralize(self, smiles: str) -> str:
        # fixpoint charge-strip — the fake analogue of the reference's
        # 9-pattern neutralise_charges (utils.py:385-438)
        return re.sub(r"[+-]", "", smiles or "")

    def postsanitize_all(self, smiles: str) -> list[str]:
        """Fake tautomer enumeration (X4 analogue of utils.py:441-517):
        each 'nh'/'hn' digram is an H-shift site; candidates are the input
        plus every single-site swap, sorted — callers take [0] as canonical,
        exactly like the reference's sorted-set-then-first convention."""
        s = smiles or ""
        cands = {s}
        for i in range(len(s) - 1):
            pair = s[i : i + 2]
            if pair == "nh":
                cands.add(s[:i] + "hn" + s[i + 2 :])
            elif pair == "hn":
                cands.add(s[:i] + "nh" + s[i + 2 :])
        return sorted(cands)

    def postsanitize(self, smiles: str) -> str:
        return self.postsanitize_all(smiles)[0]

    # --- reactions --------------------------------------------------------
    def compile_rule(self, smarts: str):
        """'pat>>repl' → (pat, repl). Mirrors SMARTS compilation at load time
        (reference pickaxe.py:379-443)."""
        if ">>" not in smarts:
            raise ValueError(f"bad rule smarts: {smarts!r}")
        pat, repl = smarts.split(">>", 1)
        return (pat, repl)

    def run_reaction(
        self,
        compiled_rule,
        reactant_smiles: list[str],
        max_products: int = 10000,
        explicit_h: bool = False,
        kekulize: bool = True,
    ) -> list[list[str]]:
        """Apply the rule to the reactant tuple; the wildcard substrate is the
        first reactant (reference binds 'Any' slots, reactions.py:224-298).
        explicit_h/kekulize are RDKit mol-prep flags — no-ops for the fake
        string chemistry, accepted for signature parity.

        Returns a list of product sets — one per match position, like RDKit's
        RunReactants enumerating attachment points.
        """
        pat, repl = compiled_rule
        substrate = next((s for s in reactant_smiles if pat in s), None)
        if substrate is None:
            return []
        out: list[list[str]] = []
        start = 0
        while len(out) < max_products:
            i = substrate.find(pat, start)
            if i < 0:
                break
            product = substrate[:i] + repl + substrate[i + len(pat):]
            out.append([product])
            start = i + 1
        return out
