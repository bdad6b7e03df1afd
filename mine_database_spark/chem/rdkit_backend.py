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
    # reference skips inorganic (carbon-free) compounds at load
    # (pickaxe.py:313); meaningless for fake letter-molecules
    organic_filter = True

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

    # The reference's neutralization table (utils.py:385-438) — the widely
    # published RDKit cookbook recipe: (charged substructure, neutral form),
    # each applied to fixpoint.
    _NEUTRAL_PATTERNS = (
        ("[n+;H]", "n"),                      # imidazoles
        ("[N+;!H0]", "N"),                    # amines
        ("[$([O-]);!$([O-][#7])]", "O"),      # carboxylic acids / alcohols
        ("[S-;X1]", "S"),                     # thiols
        ("[$([N-;X2]S(=O)=O)]", "N"),         # sulfonamides
        ("[$([N-;X2][C,N]=C)]", "N"),         # enamines
        ("[n-]", "[nH]"),                     # tetrazoles
        ("[$([S-]=O)]", "S"),                 # sulfoxides
        ("[$([N-]C=O)]", "N"),                # amides
    )
    _neutral_rxns = None

    def neutralize(self, smiles: str) -> str:
        """X3: charge neutralization to fixpoint (utils.py:385-438)."""
        mol = Chem.MolFromSmiles(smiles or "")
        if not mol:
            return smiles
        if RDKitBackend._neutral_rxns is None:
            RDKitBackend._neutral_rxns = [
                (Chem.MolFromSmarts(p), Chem.MolFromSmiles(r, sanitize=False))
                for p, r in self._NEUTRAL_PATTERNS
            ]
        for patt, repl in RDKitBackend._neutral_rxns:
            while mol.HasSubstructMatch(patt):
                mol = AllChem.ReplaceSubstructs(mol, patt, repl)[0]
        return Chem.MolToSmiles(mol)

    # X4: post-SMARTS tautomer canonicalization (utils.py:441-517). The
    # reference enumerates aromatic-N H-shift tautomers and keeps the sorted
    # set; callers pick the lexicographically first.
    _TAUTOMER_SMARTS = (
        "[#7H1X3&a:1]:[#6&a:2]:[#7H0X2&a:3]>>[#7H0X2:1]:[#6:2]:[#7H1X3:3]"
    )

    def postsanitize_all(self, smiles: str) -> list[str]:
        """All candidate tautomer SMILES, sorted (utils.py:441-517 for a
        single molecule; stereo removed as the reference does)."""
        mol = Chem.MolFromSmiles(smiles, sanitize=False)
        if mol is None:
            return [smiles]
        aromatic_bonds = [
            b.GetIdx() for b in mol.GetBonds()
            if b.GetBondType() == Chem.rdchem.BondType.AROMATIC
        ]
        for b in mol.GetBonds():
            if b.GetBondType() == Chem.rdchem.BondType.UNSPECIFIED:
                b.SetBondType(Chem.rdchem.BondType.SINGLE)
        base = None
        try:
            Chem.SanitizeMol(mol)
            Chem.rdmolops.RemoveStereochemistry(mol)
            base = Chem.MolToSmiles(mol)
        except Exception as exc:
            if "Can't kekulize mol" not in str(exc):
                Chem.rdmolops.RemoveStereochemistry(mol)
                return [Chem.MolToSmiles(mol)]
            # kekulization fallback: toggle explicit H on each aromatic N
            # until sanitization succeeds with the ring system unchanged
            pyrroles = [i[0] for i in mol.GetSubstructMatches(Chem.MolFromSmarts("n"))]
            for idx in pyrroles:
                cand = Chem.MolFromSmiles(smiles, sanitize=False)
                atom = cand.GetAtomWithIdx(idx)
                atom.SetNumExplicitHs(0 if atom.GetNumExplicitHs() else 1)
                try:
                    Chem.SanitizeMol(cand)
                except Exception:
                    continue
                same_rings = (
                    [i[0] for i in cand.GetSubstructMatches(Chem.MolFromSmarts("n"))] == pyrroles
                    and [
                        b.GetIdx() for b in cand.GetBonds()
                        if b.GetBondType() == Chem.rdchem.BondType.AROMATIC
                    ] == aromatic_bonds
                )
                if not same_rings:
                    continue
                Chem.rdmolops.RemoveStereochemistry(cand)
                base = Chem.MolToSmiles(cand)
                break
            if base is None:
                Chem.rdmolops.RemoveStereochemistry(mol)
                return [Chem.MolToSmiles(mol)]
        rxn = AllChem.ReactionFromSmarts(self._TAUTOMER_SMARTS)
        try:
            taut = rxn.RunReactants((Chem.MolFromSmiles(base),))
        except Exception:
            try:
                taut = rxn.RunReactants((Chem.MolFromSmiles(base, sanitize=False),))
            except Exception:
                return [base]
        return sorted({Chem.MolToSmiles(t[0]) for t in taut} | {base})

    def postsanitize(self, smiles: str) -> str:
        """Canonical tautomer — the reference's `postsanitize_smiles([s])[0][0]`
        (lexicographically first of the sorted tautomer set)."""
        return self.postsanitize_all(smiles)[0]

    def compile_rule(self, smarts: str):
        rxn = AllChem.ReactionFromSmarts(smarts)
        rxn.Initialize()
        return rxn

    def run_reaction(
        self,
        compiled_rule,
        reactant_smiles: list[str],
        max_products: int = 10000,
        explicit_h: bool = False,
        kekulize: bool = True,
    ):
        """Reactant prep mirrors the reference (reactions.py:262-271):
        RemoveHs → optional Kekulize(clearAromaticFlags) → AddHs when
        explicit_h (rules like 2.7.1.a bind [#1] atoms); products RemoveHs
        back before canonical SMILES (reactions.py:122-126)."""
        mols = []
        for s in reactant_smiles:
            m = Chem.MolFromSmiles(s)
            if m is None:
                return []
            m = Chem.RemoveHs(m)
            if kekulize:
                Chem.Kekulize(m, clearAromaticFlags=True)
            if explicit_h:
                m = Chem.AddHs(m)
            mols.append(m)
        out = []
        for products in compiled_rule.RunReactants(tuple(mols), maxProducts=max_products):
            smis = []
            ok = True
            for p in products:
                try:
                    if explicit_h:
                        p = Chem.RemoveHs(p)
                    Chem.SanitizeMol(p)
                    smis.append(Chem.MolToSmiles(p))
                except Exception:
                    ok = False
                    break
            if ok:
                out.append(smis)
        return out
