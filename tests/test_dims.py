"""Entity-dictionary build parity: kbspark.dims.build_entities (Spark)
vs the reference's load_entities (qurator/wikidata/entities.py:5-80)
exec'd from its own source over real pickle files."""

import urllib

import numpy as np
import pandas as pd
import pytest

from kbspark.dims import (
    LOC_CLASSES,
    ORG_CLASSES,
    PER_CLASSES,
    build_entities,
)
from tests.reference_oracle import load_reference_function

SITE = "https://de.wikipedia.org/wiki/"

ALL_CLASSES = {
    **{c: "person" for c in PER_CLASSES},
    **{c: "location" for c in LOC_CLASSES},
    **{c: "organisation" for c in ORG_CLASSES},
}


def synth_seed_frames(seed=11, n_per_class=40):
    """Per-class SPARQL-shaped frames with varying optional columns,
    duplicate URIs across classes, invalid dates, WKT coords,
    percent-encoded sitelinks, and WOA overlap (FIXTURES.md §2/§3)."""
    rng = np.random.RandomState(seed)
    frames = {}
    for ci, (cls, uri_col) in enumerate(sorted(ALL_CLASSES.items())):
        qids = rng.randint(1, 120, size=n_per_class)  # collisions on purpose
        rows = {
            uri_col: [f"http://www.wikidata.org/entity/Q{q}" for q in qids],
            "label": [f"Label {q} {cls}" for q in qids],
            "sitelink": [
                SITE + f"Titel_{q % 60}" + ("%C3%9F" if q % 7 == 0 else "")
                for q in qids
            ],
            "gndid": [f"gnd{q}" if q % 3 == 0 else None for q in qids],
        }
        if uri_col == "person":
            rows["dateofbirth"] = [
                ["1923-05-01", "-0340-01-01", "not a date", None, "1999-12-31"][
                    q % 5
                ]
                for q in qids
            ]
        if uri_col == "organisation":
            rows["inception"] = [
                ["1901-01-01", "2020-06-15", "bogus", None][q % 4] for q in qids
            ]
        if uri_col == "location":
            rows["coords"] = [
                f"Point({round(rng.uniform(-180, 180), 4)} "
                f"{round(rng.uniform(-90, 90), 4)})"
                if q % 2 == 0
                else None
                for q in qids
            ]
        frames[cls] = pd.DataFrame(rows)
    woa = pd.DataFrame(
        {"woa": [f"http://www.wikidata.org/entity/Q{q}" for q in range(1, 120, 9)]}
    )
    return frames, woa


def reference_entities(tmp_path, frames, woa, lang="de"):
    """Write the frames as the pickles the reference expects and exec its
    load_entities over them."""
    for cls, pdf in frames.items():
        pdf.to_pickle(f"{tmp_path}/{lang}-{cls}.pkl")
    woa.to_pickle(f"{tmp_path}/{lang}-work-of-arts.pkl")
    load_entities = load_reference_function(
        "qurator/wikidata/entities.py", "load_entities", extra_ns={
            "pd": pd, "urllib": urllib,
        },
    )
    return load_entities(str(tmp_path), lang, SITE)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    frames, woa = synth_seed_frames()
    tmp = tmp_path_factory.mktemp("seeds")
    ref = reference_entities(tmp, frames, woa)

    sframes = {
        cls: spark.createDataFrame(pdf.reset_index(names="_seq"))
        for cls, pdf in frames.items()
    }
    swoa = spark.createDataFrame(woa)
    ours = build_entities(sframes, swoa, SITE).toPandas()
    return ref, ours


def test_same_entity_set(built):
    ref, ours = built
    assert sorted(ours.page_title) == sorted(ref.index.tolist())


def test_same_payload_per_title(built):
    ref, ours = built
    ours_i = ours.set_index("page_title").sort_index()
    ref_i = ref.sort_index()
    assert (ours_i.wikidata == ref_i.wikidata).all()
    assert (ours_i.QID == ref_i.QID).all()
    assert (ours_i.TYPE == ref_i.TYPE).all()
    for flag in ["PER", "LOC", "ORG"]:
        assert (ours_i[flag] == ref_i[flag]).all(), flag
    for col in ["label", "sitelink", "gndid", "longitude", "latitude"]:
        a = ours_i[col].fillna("∅")
        b = ref_i[col].fillna("∅")
        assert (a == b).all(), col


def test_date_coercion_parity(built):
    ref, ours = built
    ours_i = ours.set_index("page_title").sort_index()
    ref_i = ref.sort_index()
    for col in ["dateofbirth", "inception"]:
        a = pd.to_datetime(ours_i[col])
        b = ref_i[col]
        same_null = a.isna() == b.isna()
        assert same_null.all(), col
        both = a.notna() & b.notna()
        assert (a[both] == b[both]).all(), col


def test_type_strings_composite(built):
    ref, ours = built
    assert set(ours.TYPE.unique()) <= {
        "PER", "LOC", "ORG", "PER|LOC", "PER|ORG", "LOC|ORG", "PER|LOC|ORG", ""
    }
    # PER&ORG -> ORG rule applied (entities.py:67)
    both = ours.TYPE.str.contains("PER") & ours.TYPE.str.contains("ORG")
    assert not both.any()
