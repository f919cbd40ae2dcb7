"""Property suite for the wide-row serving fast path (round-2 VERDICT
item 10, streaming/cdc.py:79-205): over RANDOM small mappings,

* whenever the compiled layout says ``static=True``, triples derived
  from the stored wide columns must equal the recompute path bit for
  bit — the subtlest invariant in the engine;
* any gating feature (inverse predicates, dynamic datatype/language,
  a different-subject asserted map) must flip ``static`` off;
* dynamic annotation metadata must clear the annotation fast path.
"""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_rdf_star_spark.mapping.flagship import prepare_input
from etl_pipeline_rdf_star_spark.mapping.ir import (
    MappingDocumentIR,
    ObjectSpec,
    PredicateObjectSpec,
    QuotedJoin,
    SourceSpec,
    SubjectSpec,
    TriplesMapIR,
)
from etl_pipeline_rdf_star_spark.operators.materialize import (
    TRIPLE_COLS,
    materialize_document,
)
from etl_pipeline_rdf_star_spark.streaming.cdc import CdcEngine

PREFIXES = {
    "ex": "http://example.org/",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}
_SRC = (SourceSpec(access="inline", fmt="parquet"),)
_SUBJ = SubjectSpec(templates=("ex:file/$(repo)/$(path)",))

# (feature name, is_gating, ObjectSpec kwargs, PO kwargs)
_FEATURES = [
    ("plain", False, dict(value="$(commit)"), {}),
    ("iri", False, dict(value="ex:repo/$(repo)", kind="iri"), {}),
    ("typed", False, dict(value="$(content_sha256)", datatype="xsd:string"), {}),
    ("lang", False, dict(value="$(path)", language="en"), {}),
    ("const", False, dict(value="fixed-value"), {}),
    ("dyn_dt", True, dict(value="$(commit)", datatype="$(lang)"), {}),
    ("dyn_lang", True, dict(value="$(commit)", language="$(lang)"), {}),
    (
        "inverse",
        True,
        dict(value="ex:repo/$(repo)", kind="iri"),
        dict(inverse_predicates=("ex:inverseOf",)),
    ),
]


def _build_ir(feature_idxs, extra_map):
    pos = []
    for i, fi in enumerate(feature_idxs):
        _, _, obj_kw, po_kw = _FEATURES[fi]
        pos.append(
            PredicateObjectSpec(
                predicates=(f"ex:p{i}",),
                objects=(ObjectSpec(**obj_kw),),
                **po_kw,
            )
        )
    maps = {
        "file": TriplesMapIR(
            name="file",
            sources=_SRC,
            subject=_SUBJ,
            predicate_objects=tuple(pos),
        )
    }
    if extra_map == "same_subject":
        maps["file2"] = TriplesMapIR(
            name="file2",
            sources=_SRC,
            subject=_SUBJ,
            predicate_objects=(
                PredicateObjectSpec(
                    predicates=("ex:extra",),
                    objects=(ObjectSpec(value="$(lang)"),),
                ),
            ),
        )
    elif extra_map == "diff_subject":
        maps["other"] = TriplesMapIR(
            name="other",
            sources=_SRC,
            subject=SubjectSpec(templates=("ex:other/$(repo)",)),
            predicate_objects=(
                PredicateObjectSpec(
                    predicates=("ex:extra",),
                    objects=(ObjectSpec(value="$(lang)"),),
                ),
            ),
        )
    gating = any(_FEATURES[fi][1] for fi in feature_idxs) or (
        extra_map == "diff_subject"
    )
    return (
        MappingDocumentIR(
            prefixes=PREFIXES, base_iri=None, triples_maps=maps
        ),
        gating,
    )


def _input(spark):
    rows = [
        (0, "I", "repo_a", "x.py", "c1", "en", "print(1)", None),
        (1, "I", "repo_a", "y.py", "c2", "fr", "print(22)", None),
        (2, "I", "repo_b", "z.py", "c3", "en", "print(333)", None),
        (3, "I", "repo_b", "w rü.py", 'c"4', "de", 'say("hi\\n")', None),
    ]
    return spark.createDataFrame(
        rows,
        "seq long, op string, repo string, path string, commit string,"
        " lang string, content string, event_ts timestamp",
    )


def _canon(df, cols):
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    feature_idxs=st.lists(
        st.integers(min_value=0, max_value=len(_FEATURES) - 1),
        min_size=1,
        max_size=4,
        unique=True,
    ),
    extra_map=st.sampled_from([None, "same_subject", "diff_subject"]),
)
def test_wide_fast_path_equals_recompute(spark, feature_idxs, extra_map):
    ir, gating = _build_ir(feature_idxs, extra_map)
    eng = CdcEngine(
        spark, tempfile.mkdtemp(), ir=ir, asserted_tm="file",
        annotation_tm=None, n_buckets=2,
    )
    assert eng._layout.static == (not gating), (
        f"static flag wrong for features "
        f"{[_FEATURES[i][0] for i in feature_idxs]} + {extra_map}"
    )
    df = _input(spark)
    sources = {
        name: prepare_input(df.drop("seq", "op", "event_ts"))
        for name in ir.triples_maps
    }
    expected = _canon(materialize_document(sources, ir)[0], TRIPLE_COLS)
    if eng._layout.static:
        wide = eng.materialize_wide(df)
        got = _canon(eng._triples_from_wide(wide), TRIPLE_COLS)
        assert got == expected
    else:
        # the recompute path must still cover the gated mapping
        assert expected


@pytest.mark.parametrize("dyn", [False, True])
def test_annotation_fast_path_gating_and_equality(spark, dyn):
    """Constant annotation metadata serves from the wide struct; a dynamic
    datatype must clear the annotation layout (recompute only)."""
    ann_obj = (
        ObjectSpec(value="$(confidence)", datatype="$(lang)")
        if dyn
        else ObjectSpec(value="$(confidence)", datatype="xsd:decimal")
    )
    maps = {
        "file": TriplesMapIR(
            name="file",
            sources=_SRC,
            subject=_SUBJ,
            predicate_objects=(
                PredicateObjectSpec(
                    predicates=("ex:lang",),
                    objects=(ObjectSpec(value="$(lang)"),),
                ),
            ),
        ),
        "provenance": TriplesMapIR(
            name="provenance",
            sources=_SRC,
            subject=SubjectSpec(
                quoted_join=QuotedJoin("file", "file_key", "file_key")
            ),
            predicate_objects=(
                PredicateObjectSpec(
                    predicates=("ex:confidence",), objects=(ann_obj,)
                ),
            ),
        ),
    }
    ir = MappingDocumentIR(prefixes=PREFIXES, base_iri=None, triples_maps=maps)
    eng = CdcEngine(
        spark, tempfile.mkdtemp(), ir=ir, asserted_tm="file",
        annotation_tm="provenance", n_buckets=2,
    )
    if dyn:
        assert eng._layout.annotation == []
        return
    assert eng._layout.annotation
    df = _input(spark)
    wide = eng.materialize_wide(df)
    sources = {
        name: prepare_input(df.drop("seq", "op", "event_ts"))
        for name in ir.triples_maps
    }
    _, anns = materialize_document(sources, ir)
    cols = ["reifier", "predicate", "object", "object_datatype", "object_lang"]
    got = _canon(eng._annotations_from_wide(wide), cols)
    assert got == _canon(anns, cols)
