"""Category-closure flow parity: descendant_edges + category_member_pages
vs the reference's get_sub_cats/get_category_pages
(qurator/wikipedia/entities.py:9-67) exec'd over a real SQLite db —
including cycles and dangling children (FIXTURES.md §4)."""

import sqlite3
import sys

import numpy as np
import pandas as pd

from kbspark.closure import category_member_pages, descendant_edges
from tests.reference_oracle import load_reference_functions


def synth_category_db(tmp_path, seed=29, n_cats=40, n_articles=80):
    rng = np.random.RandomState(seed)
    cats = pd.DataFrame(
        {
            "page_id": range(1000, 1000 + n_cats),
            "page_title": [f"Cat_{i}" for i in range(n_cats)],
            "page_namespace": [14] * n_cats,
        }
    )
    arts = pd.DataFrame(
        {
            "page_id": range(1, n_articles + 1),
            "page_title": [
                f"Liste_von_{i}" if i % 10 == 0 else f"Artikel_{i}"
                for i in range(1, n_articles + 1)
            ],
            "page_namespace": [0] * n_articles,
        }
    )
    page = pd.concat([cats, arts], ignore_index=True)

    links = []
    # category DAG edges + explicit cycles
    for i in range(n_cats):
        for _ in range(2):
            child = int(rng.randint(0, n_cats))
            links.append((f"Cat_{i}", 1000 + child))
    links += [("Cat_0", 1001), ("Cat_1", 1002), ("Cat_2", 1000)]  # cycle
    # article members
    for a in range(1, n_articles + 1):
        links.append((f"Cat_{int(rng.randint(0, n_cats))}", a))
    # dangling child id (no page row) — exercises the left join
    links.append(("Cat_0", 99999))
    categorylinks = pd.DataFrame(links, columns=["cl_to", "cl_from"])

    db = str(tmp_path / "cats.sqlite3")
    with sqlite3.connect(db) as cnx:
        page.to_sql("page", cnx, index=False)
        categorylinks.to_sql("categorylinks", cnx, index=False)
    return db, page, categorylinks


def synth_entity_db(tmp_path, seed=31, n_subcats=30, n_articles=120):
    """Category DB with the reference extract job's five German roots,
    overlapping subtrees (per∩org, loc∩org, loc∩notion), a cycle,
    Liste_ pages and a dangling child — everything entities.py:196-247
    branches on."""
    rng = np.random.RandomState(seed)
    roots = ["Organisation", "Geographisches_Objekt",
             "Geographischer_Begriff", "Frau", "Mann"]
    cat_titles = roots + [f"Sub_{i}" for i in range(n_subcats)]
    cats = pd.DataFrame(
        {
            "page_id": range(2000, 2000 + len(cat_titles)),
            "page_title": cat_titles,
            "page_namespace": [14] * len(cat_titles),
        }
    )
    id_of = dict(zip(cats.page_title, cats.page_id))
    arts = pd.DataFrame(
        {
            "page_id": range(1, n_articles + 1),
            "page_title": [
                f"Liste_von_{i}" if i % 9 == 0 else f"Seite_{i}"
                for i in range(1, n_articles + 1)
            ],
            "page_namespace": [0] * n_articles,
        }
    )
    page = pd.concat([cats, arts], ignore_index=True)

    links = []
    # each subcat hangs under 1-2 random parents (roots or other subs) —
    # random cross-links create overlapping subtrees across types
    for i in range(n_subcats):
        for _ in range(int(rng.randint(1, 3))):
            parent = cat_titles[int(rng.randint(0, len(cat_titles)))]
            links.append((parent, id_of[f"Sub_{i}"]))
    # guaranteed overlaps + a cycle + a dangling child
    links += [
        ("Organisation", id_of["Sub_0"]), ("Frau", id_of["Sub_0"]),
        ("Organisation", id_of["Sub_1"]),
        ("Geographisches_Objekt", id_of["Sub_1"]),
        ("Geographisches_Objekt", id_of["Sub_2"]),
        ("Geographischer_Begriff", id_of["Sub_2"]),
        ("Sub_3", id_of["Sub_4"]), ("Sub_4", id_of["Sub_3"]),
        ("Mann", id_of["Sub_3"]),
        ("Organisation", 99999),
    ]
    for a in range(1, n_articles + 1):
        for _ in range(int(rng.randint(1, 3))):
            links.append((cat_titles[int(rng.randint(0, len(cat_titles)))], a))
    categorylinks = pd.DataFrame(links, columns=["cl_to", "cl_from"])

    db = str(tmp_path / "ents.sqlite3")
    with sqlite3.connect(db) as cnx:
        page.to_sql("page", cnx, index=False)
        categorylinks.to_sql("categorylinks", cnx, index=False)
    return db, page, categorylinks


def _edges(spark, page, categorylinks):
    """The shared edge preparation of entities.py:40-42 (one definition
    for both parity tests — round-4 test review: it was duplicated)."""
    s_page = spark.createDataFrame(page)
    s_links = spark.createDataFrame(categorylinks)
    cat_pages = s_page.filter("page_namespace = 14").select(
        "page_id", "page_title"
    )
    edges = s_links.join(
        cat_pages, s_links.cl_from == cat_pages.page_id, "left"
    ).select("cl_to", "cl_from", "page_title")
    return s_page, edges


def test_category_entities_parity(spark, tmp_path):
    """kbspark.closure.category_entities vs the reference's composed
    extract job (entities.py:196-247) exec'd from source (click
    decorators stripped) over the same SQLite fixture — exact
    (page_title, TYPE) multiset match, including the type-priority
    exclusions org∖(per∪loc) and loc∖(per∪notion)."""
    from kbspark.closure import category_entities

    db, page, categorylinks = synth_entity_db(tmp_path)

    fns = load_reference_functions(
        "qurator/wikipedia/entities.py",
        ["_get_cats", "get_sub_cats", "get_category_pages", "extract"],
        extra_ns={"pd": pd, "sqlite3": sqlite3, "np": np},
        strip_decorators=True,
    )
    sys.setrecursionlimit(10000)
    out_pkl = str(tmp_path / "all_entities.pkl")
    fns["extract"](db, out_pkl)
    ref = pd.read_pickle(out_pkl)
    ref_pairs = sorted(zip(ref.index, ref["TYPE"]))

    s_page, edges = _edges(spark, page, categorylinks)

    ours = category_entities(s_page, edges).toPandas()
    ours_pairs = sorted(zip(ours.page_title, ours.TYPE))
    assert ours_pairs == ref_pairs
    assert len(ours_pairs) > 0
    assert {t for _, t in ours_pairs} == {"PER", "LOC", "ORG"}


def test_category_closure_parity(spark, tmp_path):
    db, page, categorylinks = synth_category_db(tmp_path)

    fns = load_reference_functions(
        "qurator/wikipedia/entities.py",
        ["_get_cats", "get_sub_cats", "get_category_pages"],
        extra_ns={"pd": pd, "sqlite3": sqlite3},
    )
    sys.setrecursionlimit(10000)
    with sqlite3.connect(db) as cnx:
        ref_cats = fns["get_sub_cats"]("Cat_0", cnx)
        ref_pages = fns["get_category_pages"](ref_cats, cnx)

    # Spark side: same edge preparation as entities.py:40-42
    s_page, edges = _edges(spark, page, categorylinks)

    ours_cats_df = descendant_edges(edges, "Cat_0")
    ours_cats = ours_cats_df.toPandas()
    # The reference's final drop_duplicates() (entities.py:48) ignores the
    # cl_to index, collapsing same-child-different-parent edges — an
    # information-losing quirk its own downstream never observes (only
    # cats.cl_from is consumed, entities.py:57). Parity is asserted on
    # that consumed semantic: the child-id set (and the pages below);
    # our edge set additionally keeps correct parent attribution.
    assert set(ours_cats.cl_from) == set(ref_cats.cl_from)
    ref_pairs = {
        (r.cl_to, r.cl_from) for r in ref_cats.reset_index().itertuples()
    }
    ours_pairs = {(r.cl_to, r.cl_from) for r in ours_cats.itertuples()}
    assert ref_pairs <= ours_pairs  # superset only adds parent attribution

    ours_pages = category_member_pages(s_page, ours_cats_df).toPandas()
    assert sorted(ours_pages.page_title) == sorted(ref_pages.page_title)
    assert not ours_pages.page_title.str.startswith("Liste_").any()
