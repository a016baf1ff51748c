"""The 31-condition CCW catalog (reference: ``ref.ccw_lookup`` —
loaded from an external workbook by ``load_ref.ccw_lookup.R``; the
condition list is the default of ``R/claims_condition.R:53-69``).

The workbook itself is not in the reference repo, so the per-condition
parameters here are reconstructed from the public CMS Chronic
Conditions Warehouse algorithms (reference period, qualifying-claim
rules) expressed in King County claim-type ids (1 = inpatient,
4 = outpatient, 5 = professional — ``ref_kc_claim_type_crosswalk``):

- ``condition_type 1`` conditions qualify on a single claim of any
  listed type (dementias, cancers) or on inpatient-only evidence
  (AMI, hip fracture);
- ``condition_type 2`` conditions implement "one inpatient OR two
  other-setting claims at least one day apart within the reference
  period": claim_type_1 = the single-claim settings, claim_type_2 =
  the two-claim settings, with ``lookback_months`` as the reference
  period.

Each row is directly consumable by
``claims_data_spark.tables.conditions.build_claim_ccw`` (conditions
whose flag column is absent from the ICD master are skipped by the
engine, so a deployment can carry any subset of the flag matrix).
"""

from __future__ import annotations

_ONE_ANY = {"condition_type": 1, "claim_type_1": "1;4;5", "claim_type_2": None}
_ONE_IP = {"condition_type": 1, "claim_type_1": "1", "claim_type_2": None}
_IP_OR_TWO = {"condition_type": 2, "claim_type_1": "1", "claim_type_2": "4;5"}


def _c(code, abbrev, desc, lookback_months, rule, dx_fields="any"):
    return {
        "ccw_code": code,
        "ccw_desc": desc,
        "ccw_abbrev": abbrev,
        "dx_fields": dx_fields,
        "claim_type_1": rule["claim_type_1"],
        "claim_type_2": rule["claim_type_2"],
        "condition_type": rule["condition_type"],
        "lookback_months": lookback_months,
    }


CCW_CATALOG: list[dict] = [
    _c(1, "ccw_alzheimer", "Alzheimer's disease", 36, _ONE_ANY),
    _c(2, "ccw_alzheimer_related", "Alzheimer's and related dementias", 36, _ONE_ANY),
    _c(3, "ccw_anemia", "Anemia", 12, _IP_OR_TWO),
    _c(4, "ccw_arthritis", "Rheumatoid/osteoarthritis", 24, _IP_OR_TWO),
    _c(5, "ccw_asthma", "Asthma", 12, _IP_OR_TWO),
    _c(6, "ccw_atrial_fib", "Atrial fibrillation", 12, _IP_OR_TWO),
    _c(7, "ccw_bph", "Benign prostatic hyperplasia", 12, _IP_OR_TWO),
    _c(8, "ccw_cancer_breast", "Breast cancer", 12, _ONE_ANY),
    _c(9, "ccw_cancer_colorectal", "Colorectal cancer", 12, _ONE_ANY),
    _c(10, "ccw_cancer_endometrial", "Endometrial cancer", 12, _ONE_ANY),
    _c(11, "ccw_cancer_lung", "Lung cancer", 12, _ONE_ANY),
    _c(12, "ccw_cancer_prostate", "Prostate cancer", 12, _ONE_ANY),
    _c(13, "ccw_cancer_urologic", "Urologic cancer", 12, _ONE_ANY),
    _c(14, "ccw_cataract", "Cataract", 12, _IP_OR_TWO),
    _c(15, "ccw_chr_kidney_dis", "Chronic kidney disease", 24, _IP_OR_TWO),
    _c(16, "ccw_copd", "COPD and bronchiectasis", 12, _IP_OR_TWO),
    _c(17, "ccw_depression", "Depression", 12, _IP_OR_TWO),
    _c(18, "ccw_diabetes", "Diabetes", 24, _IP_OR_TWO),
    _c(19, "ccw_glaucoma", "Glaucoma", 12, _IP_OR_TWO),
    _c(20, "ccw_heart_failure", "Heart failure", 24, _IP_OR_TWO),
    _c(21, "ccw_hip_fracture", "Hip/pelvic fracture", 12, _ONE_IP),
    _c(22, "ccw_hyperlipid", "Hyperlipidemia", 12, _IP_OR_TWO),
    _c(23, "ccw_hypertension", "Hypertension", 12, _IP_OR_TWO),
    _c(24, "ccw_hypothyroid", "Acquired hypothyroidism", 12, _IP_OR_TWO),
    _c(25, "ccw_ischemic_heart_dis", "Ischemic heart disease", 24, _IP_OR_TWO),
    _c(26, "ccw_mi", "Acute myocardial infarction", 12, _ONE_IP),
    _c(27, "ccw_non_alzheimer_dementia", "Non-Alzheimer dementia", 36, _ONE_ANY),
    _c(28, "ccw_osteoporosis", "Osteoporosis", 12, _IP_OR_TWO),
    _c(29, "ccw_parkinsons", "Parkinson's disease", 36, _IP_OR_TWO),
    _c(30, "ccw_pneumonia", "Bacterial pneumonia", 12, _IP_OR_TWO),
    _c(31, "ccw_stroke", "Stroke / TIA", 12, _IP_OR_TWO),
]


def ccw_lookup_rows(subset: list[str] | None = None) -> list[dict]:
    """Catalog rows for ``build_claim_ccw``; optionally a named subset
    (the reference's ``ccw_list_name`` parameter,
    ``load_ccw.R:158-184``). Unknown names raise, like the reference.
    """
    if subset is None:
        return list(CCW_CATALOG)
    known = {c["ccw_abbrev"] for c in CCW_CATALOG}
    bad = [s for s in subset if s not in known]
    if bad:
        raise KeyError(
            f"unknown CCW conditions {bad}; see ccw_catalog.CCW_CATALOG"
        )
    return [c for c in CCW_CATALOG if c["ccw_abbrev"] in subset]
