"""Heavyweight optional filters (SURVEY §2.3 F5/F7/F8) — same plugin
surface as the reference, dependencies gated exactly like the reference
gates them (pickaxe_run_template.py:33-35 imports them lazily).

  * MCSFilter runs everywhere (fake backend ⇒ longest-common-substring
    overlap; RDKit backend ⇒ rdFMCS).
  * ThermoFilter / ReactionFeasibilityFilter require equilibrator / torch
    stacks that are not in this container: constructing them without the
    dependency raises ImportError with the reference's dependency names, and
    the relational keep/drop contract is identical to the cheap filters, so
    swapping the scoring UDF in is the only production change.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mine_database_spark.operators.filters import BaseFilter


class MCSFilter(BaseFilter):
    """F5 (filters/similarity.py:800-1022): keep compounds whose maximum
    common substructure with any target covers >= crit of the target.

    Fake backend: molecules are strings, so MCS = longest common substring;
    overlap ratio = len(lcs)/len(target). RDKit backend would swap in
    rdFMCS.FindMCS atom+bond counts — the Spark plan is identical (targets
    broadcast into the UDF, decision relational).
    """

    filter_name = "MCS"

    def __init__(self, target_smiles: list[str], crit_mcs: float = 0.5):
        self.target_smiles = list(target_smiles)
        self.crit = crit_mcs

    def choose(self, cands: DataFrame, generation: int) -> DataFrame:
        targets = self.target_smiles
        crit = self.crit

        @F.pandas_udf("double")
        def mcs_overlap(smiles: pd.Series) -> pd.Series:
            from difflib import SequenceMatcher

            def best(s: str) -> float:
                out = 0.0
                for t in targets:
                    m = SequenceMatcher(None, s or "", t, autojunk=False)
                    blk = m.find_longest_match(0, len(s or ""), 0, len(t))
                    if t:
                        out = max(out, blk.size / len(t))
                return out

            return smiles.map(best)

        return cands.select("_id", (mcs_overlap(F.col("smiles")) >= crit).alias("keep"))


class ThermoFilter(BaseFilter):
    """F7 (filters/thermodynamics.py:17-160): drop reactions with
    ΔG′ >= dg_max. Requires the eQuilibrator stack."""

    filter_name = "Thermo"

    def __init__(self, dg_max: float = 0.0):
        try:
            import equilibrator_api  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "ThermoFilter requires equilibrator_api (reference: thermodynamics.py:25-357); "
                "not available in this container"
            ) from e
        self.dg_max = dg_max

    def choose(self, cands: DataFrame, generation: int) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


class ReactionFeasibilityFilter(BaseFilter):
    """F8 (filters/feasibility.py:102-502): VAE+DNN feasibility scoring per
    reactant×product pair. Requires torch + keras."""

    filter_name = "Feasibility"

    def __init__(self, threshold: float = 0.32):
        try:
            import torch  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "ReactionFeasibilityFilter requires torch/keras (reference: feasibility.py:406-502); "
                "not available in this container"
            ) from e
        self.threshold = threshold

    def choose(self, cands: DataFrame, generation: int) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


def np_likeness_score(compounds: DataFrame, model: dict[str, float] | None = None) -> DataFrame:
    """X8 (NP_Score/npscorer.py:30-55): natural-product-likeness — sum of
    fragment scores / atom count, log-damped outside [-4, 4]. The fragment
    model dict is broadcast; fake backend uses character bigrams as
    'fragments' so the pipeline is runnable without RDKit."""
    frag_model = model or {}

    @F.pandas_udf("double")
    def np_score(smiles: pd.Series) -> pd.Series:
        import math

        def score(s: str) -> float:
            s = s or ""
            frags = [s[i : i + 2] for i in range(len(s) - 1)]
            if not frags:
                return 0.0
            raw = sum(frag_model.get(f, 0.0) for f in frags) / max(len(s), 1)
            if raw > 4:
                raw = 4 + math.log10(raw - 3)
            elif raw < -4:
                raw = -4 - math.log10(-raw - 3)
            return raw

        return smiles.map(score)

    return compounds.withColumn("np_score", np_score(F.col("smiles")))
