"""Redirect resolution parity: kbspark.redirects vs the reference's
get_redirects / redirects2entities (qurator/wikipedia/entities.py:89-188)
exec'd from source over a real in-tmp SQLite database."""

import sqlite3

import numpy as np
import pandas as pd

from kbspark.redirects import get_redirects, redirect_dict, redirects_to_entities
from tests.reference_oracle import load_reference_function


def synth_wiki_db(tmp_path, seed=17, n_pages=120, n_redirects=50):
    """page + redirect tables with redirects to entities, to non-entities,
    chains, and a duplicate rd_from case (FIXTURES.md §4)."""
    rng = np.random.RandomState(seed)
    page = pd.DataFrame(
        {
            "page_id": range(1, n_pages + 1),
            "page_title": [f"Page_{i}" for i in range(1, n_pages + 1)],
            "page_namespace": [0] * n_pages,
        }
    )
    # redirect sources are pages 61..110; targets random pages incl. chains
    rd_from = list(range(61, 61 + n_redirects))
    rd_title = [f"Page_{int(rng.randint(1, 80))}" for _ in range(n_redirects)]
    redirect = pd.DataFrame({"rd_from": rd_from, "rd_title": rd_title})
    db = str(tmp_path / "wiki.sqlite3")
    with sqlite3.connect(db) as cnx:
        page.to_sql("page", cnx, index=False)
        redirect.to_sql("redirect", cnx, index=False)
    return db, page, redirect


def synth_entities(n=40):
    """Entity dictionary keyed by page_title (a subset of pages)."""
    titles = [f"Page_{i}" for i in range(1, n + 1)]
    return pd.DataFrame(
        {"TYPE": [("PER", "LOC", "ORG")[i % 3] for i in range(n)]},
        index=pd.Index(titles, name="page_title"),
    )


def test_get_redirects_parity(spark, tmp_path):
    db, page, redirect = synth_wiki_db(tmp_path)
    entities = synth_entities()

    ref_get_redirects = load_reference_function(
        "qurator/wikipedia/entities.py", "get_redirects",
        extra_ns={"pd": pd, "sqlite3": sqlite3, "print": lambda *a, **k: None},
    )
    ref_redirects, _ref_page = ref_get_redirects(entities, db)

    s_entities = spark.createDataFrame(entities.reset_index())
    s_redirect = spark.createDataFrame(redirect)
    s_page = spark.createDataFrame(page)
    ours, dup_metric = get_redirects(s_entities, s_redirect, s_page)
    ours_pdf = (
        ours.select("rd_from_title", "rd_title", "TYPE")
        .toPandas()
        .set_index("rd_from_title")
        .sort_index()
    )

    assert sorted(ours_pdf.index) == sorted(ref_redirects.index)
    ref_sorted = ref_redirects.sort_index()
    assert (ours_pdf["rd_title"] == ref_sorted["rd_title"]).all()
    assert (ours_pdf["TYPE"] == ref_sorted["TYPE"]).all()

    # dup metric equals the reference's duplicated count pre-dedup —
    # compared against the reference's OWN computation, not just >= 0
    # (round-4 test review: the old assert was vacuous)
    n_dup = int(dup_metric.collect()[0]["n_duplicated_redirects"] or 0)
    assert n_dup == int(ref_redirects.index.duplicated().sum())
    assert not ours_pdf.index.duplicated().any()


def test_redirects2entities_parity(spark, tmp_path):
    db, page, redirect = synth_wiki_db(tmp_path, seed=23)
    entities = synth_entities()

    # run the reference's OWN redirects2entities CLI body, exec'd from
    # source with its click decorators stripped (round-3 test review:
    # a hand-replicated loop could encode the same misreading as the
    # engine; the genuine body keeps the oracle independent)
    from tests.reference_oracle import load_reference_functions

    ref = load_reference_functions(
        "qurator/wikipedia/entities.py",
        ["redirects2entities", "get_redirects"],
        extra_ns={
            "pd": pd,
            "sqlite3": sqlite3,
            "tqdm": lambda it, total=None: it,
            "print": lambda *a, **k: None,
        },
        strip_decorators=True,
    )
    ent_pkl = str(tmp_path / "entities.pkl")
    out_pkl = str(tmp_path / "r2e.pkl")
    entities.to_pickle(ent_pkl)
    ref["redirects2entities"](db, ent_pkl, out_pkl)
    expected_raw = pd.read_pickle(out_pkl).reset_index()
    expected = (
        expected_raw
        .drop_duplicates(subset="page_title")
        .sort_values("page_title")
        .reset_index(drop=True)[["page_title", "TYPE"]]
    )

    s_entities = spark.createDataFrame(entities.reset_index())
    s_redirects, _ = get_redirects(
        s_entities, spark.createDataFrame(redirect), spark.createDataFrame(page)
    )
    ours = (
        redirects_to_entities(s_entities, s_redirects)
        .toPandas()
        .sort_values("page_title")
        .reset_index(drop=True)
    )
    # full (page_title, TYPE) parity — keep-first follows the reference's
    # source-title iteration order, so the surviving TYPE must match too
    assert list(map(tuple, ours[["page_title", "TYPE"]].values)) == list(
        map(tuple, expected[["page_title", "TYPE"]].values)
    )


def test_redirect_dict_roundtrip(spark, tmp_path):
    db, page, redirect = synth_wiki_db(tmp_path, seed=5)
    entities = synth_entities()
    s_redirects, _ = get_redirects(
        spark.createDataFrame(entities.reset_index()),
        spark.createDataFrame(redirect),
        spark.createDataFrame(page),
    )
    d = redirect_dict(s_redirects)
    assert len(d) == s_redirects.count()
    assert all(v.startswith("Page_") for v in d.values())


def test_dup_metric_and_keep_first_on_duplicate_sources(spark):
    """The fixture's redirects are all unique, so this pins the paths the
    parity test cannot reach (round-3 test review): a source page with
    THREE redirect rows must count 2 duplicated rows (the reference's
    index.duplicated().sum() semantics) and keep exactly one survivor —
    the engine's documented deterministic choice (min rd_title; the
    reference keeps its frame-order first row)."""
    import pandas as pd

    from kbspark.redirects import get_redirects

    entities = pd.DataFrame(
        {"page_title": ["T1", "T2", "T3", "T9"],
         "TYPE": ["PER", "LOC", "ORG", "PER"],
         "QID": ["Q1", "Q2", "Q3", "Q9"]}
    )
    # page 5 ('Dup') redirects to three different entity targets
    redirect = pd.DataFrame(
        {"rd_from": [5, 5, 5, 6], "rd_title": ["T2", "T1", "T3", "T9"]}
    )
    page = pd.DataFrame(
        {"page_id": [5, 6], "page_title": ["Dup", "Solo"],
         "page_namespace": [0, 0]}
    )
    redirects, dup_metric = get_redirects(
        spark.createDataFrame(entities),
        spark.createDataFrame(redirect),
        spark.createDataFrame(page),
    )
    assert dup_metric.collect()[0]["n_duplicated_redirects"] == 2
    rows = {
        r["rd_from_title"]: r["rd_title"] for r in redirects.collect()
    }
    assert rows == {"Dup": "T1", "Solo": "T9"}  # keep-first = min rd_title
