"""RDKit chemistry backend — used automatically when rdkit is installed.

Faithful to the reference's use of RDKit (SURVEY §2.10):
  * identity via InChIKey first block       (utils.py:115-164)
  * SMARTS reactions via RunReactants        (reactions.py:44-220, maxProducts cap :170)
  * descriptors via Descriptors/rdMolDescriptors (databases.py:543-564)

Not importable in this container (no rdkit) — kept as the production path.
"""

from __future__ import annotations

from rdkit import Chem  # noqa: F401  (ImportError → fake backend selected)
from rdkit.Chem import AllChem, Descriptors, rdMolDescriptors


class RDKitBackend:
    name = "rdkit"
    # real chemistry conserves atoms → the engine's balance rejection
    # (reference reactions.py:194-198) is always on under this backend
    conserves_atoms = True

    def canonical_smiles(self, smiles: str) -> str | None:
        mol = Chem.MolFromSmiles(smiles or "")
        return Chem.MolToSmiles(mol) if mol else None

    def inchi_key(self, smiles: str) -> str | None:
        mol = Chem.MolFromSmiles(smiles or "")
        return Chem.MolToInchiKey(mol) if mol else None

    def atom_count(self, smiles: str) -> dict[str, int]:
        from collections import Counter

        mol = Chem.MolFromSmiles(smiles or "")
        if not mol:
            return {}
        mol = Chem.AddHs(mol)
        return dict(Counter(a.GetSymbol() for a in mol.GetAtoms()))

    def formula(self, smiles: str) -> str:
        mol = Chem.MolFromSmiles(smiles or "")
        return rdMolDescriptors.CalcMolFormula(mol) if mol else ""

    def exact_mol_wt(self, smiles: str) -> float:
        mol = Chem.MolFromSmiles(smiles or "")
        return Descriptors.ExactMolWt(mol) if mol else 0.0

    def formal_charge(self, smiles: str) -> int:
        mol = Chem.MolFromSmiles(smiles or "")
        return Chem.GetFormalCharge(mol) if mol else 0

    def logp(self, smiles: str) -> float:
        mol = Chem.MolFromSmiles(smiles or "")
        return Descriptors.MolLogP(mol) if mol else 0.0

    def fingerprint(self, smiles: str, n_bits: int = 512, k: int = 16) -> list[int]:
        mol = Chem.MolFromSmiles(smiles or "")
        if not mol:
            return []
        fp = Chem.RDKFingerprint(mol, fpSize=n_bits)
        return sorted(fp.GetOnBits())

    def neutralize(self, smiles: str) -> str:
        # reference neutralise_charges applies 9 SMARTS patterns to fixpoint
        # (utils.py:385-438); simplified here — production should port them
        mol = Chem.MolFromSmiles(smiles or "")
        return Chem.MolToSmiles(mol) if mol else smiles

    def compile_rule(self, smarts: str):
        rxn = AllChem.ReactionFromSmarts(smarts)
        rxn.Initialize()
        return rxn

    def run_reaction(self, compiled_rule, reactant_smiles: list[str], max_products: int = 10000):
        mols = [Chem.MolFromSmiles(s) for s in reactant_smiles]
        if any(m is None for m in mols):
            return []
        out = []
        for products in compiled_rule.RunReactants(tuple(mols), maxProducts=max_products):
            smis = []
            ok = True
            for p in products:
                try:
                    Chem.SanitizeMol(p)
                    smis.append(Chem.MolToSmiles(p))
                except Exception:
                    ok = False
                    break
            if ok:
                out.append(smis)
        return out
