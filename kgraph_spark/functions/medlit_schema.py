"""MedLit domain schema tables needed by the Pass-2 merge (data, not logic).

These tables are the *derived output* of the reference's schema code —
obtained by instantiating `MedLitDomainSchema().predicate_constraints`
(reference examples/medlit/domain.py:70-90, which derives them from
vocab.get_valid_predicates over the 12 registered entity types) and reading
`domain_spec.PREDICATES` / `NORMALIZED_TO_BUNDLE`
(reference examples/medlit/domain_spec.py:279-458). They are embedded here
as plain data so the Spark pipeline can broadcast them as dimension tables;
none of the reference's class machinery is reproduced.
"""

from __future__ import annotations

# predicate (lowercase) -> (allowed subject types, allowed object types),
# types in the reference's lowercase "predicate semantics" vocabulary.
# Derived from MedLitDomainSchema().predicate_constraints (domain.py:70-90).
_ASSOC_TYPES = (
    "anatomicalstructure",
    "biomarker",
    "disease",
    "drug",
    "ethnicity",
    "gene",
    "hormone",
    "location",
    "pathway",
    "procedure",
    "protein",
    "symptom",
)

PREDICATE_CONSTRAINTS: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "participates_in": (("gene", "protein"), ("pathway",)),
    "contraindicated_for": (("drug",), ("disease",)),
    "endemic_to": (("disease",), ("location",)),
    "side_effect": (("drug",), ("symptom",)),
    "prevalent_in": (("disease", "gene"), ("ethnicity", "location")),
    "targets": (("drug", "procedure"), ("gene", "protein")),
    "interacts_with": (("drug",), ("drug",)),
    "causes": (("disease", "hormone"), ("symptom",)),
    "diagnosed_by": (("disease",), ("biomarker", "procedure")),
    "located_in": (("disease", "symptom"), ("anatomicalstructure",)),
    "prevents": (("drug",), ("disease",)),
    "indicates": (("biomarker",), ("disease",)),
    "decreases_risk": (("ethnicity", "gene"), ("disease",)),
    "manages": (("drug", "procedure"), ("disease",)),
    "subtype_of": (("disease",), ("disease",)),
    "increases_risk": (("disease", "ethnicity", "gene"), ("disease",)),
    "associated_with": (_ASSOC_TYPES, _ASSOC_TYPES),
    "treats": (("drug", "procedure"), ("disease",)),
    "encodes": (("gene",), ("protein",)),
}

# Predicates flagged symmetric=True in domain_spec.PREDICATES — symmetric
# edges are stored with (min, max) endpoint order (pipeline/utils.py:4-10).
SYMMETRIC_PREDICATES: frozenset[str] = frozenset(
    {"ASSOCIATED_WITH", "INTERACTS_WITH", "IS_COLLEAGUE", "SAME_AS"}
)

# Bundle class (PascalCase) -> predicate-semantics type (lowercase, no
# separators). Inverse of domain_spec.NORMALIZED_TO_BUNDLE (line 279): the
# mapping used for swap-correction type checks — NO authority overrides
# (dedup.py:165-171: Hormone stays "hormone" for predicate semantics even
# though it resolves through the "drug" authority).
BUNDLE_CLASS_TO_TYPE: dict[str, str] = {
    "Disease": "disease",
    "Gene": "gene",
    "Paper": "paper",
    "Drug": "drug",
    "Protein": "protein",
    "Hormone": "hormone",
    "Enzyme": "enzyme",
    "Biomarker": "biomarker",
    "Symptom": "symptom",
    "Procedure": "procedure",
    "Mutation": "mutation",
    "Pathway": "pathway",
    "BiologicalProcess": "biologicalprocess",
    "AnatomicalStructure": "anatomicalstructure",
    "Author": "author",
    "Institution": "institution",
    "Hypothesis": "hypothesis",
    "Evidence": "evidence",
    "Location": "location",
    "Ethnicity": "ethnicity",
}

# British -> American spelling applied before dedup-name lookups
# (dedup.py:29-41, SPELLING_NORMALIZATIONS).
SPELLING_NORMALIZATIONS: dict[str, str] = {
    "hyperglycaemia": "hyperglycemia",
    "haemoglobin": "hemoglobin",
    "tumour": "tumor",
    "oesophagus": "esophagus",
    "leukaemia": "leukemia",
}

SAME_AS = "SAME_AS"
SAME_AS_MIN_CONFIDENCE = 0.85  # dedup.py:380 — auto-merge threshold
