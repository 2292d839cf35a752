"""S1 raw-dump sources: XML shard parsing (namespace validation,
ns-0 filter, memory-bounded iterparse) and the WARC-ish reader."""

import pytest

from kbspark.sources import read_warcish, read_wiki_xml, validate_namespace

NS_URI = "http://www.mediawiki.org/xml/export-0.10/"


def _dump_xml(pages):
    body = "".join(
        f"<page><title>{t}</title><ns>{ns}</ns><id>{i}</id>"
        f"<revision><text>{x}</text></revision></page>"
        for i, t, ns, x in pages
    )
    return f'<mediawiki xmlns="{NS_URI}">{body}</mediawiki>'.encode()


def test_read_wiki_xml(spark, tmp_path):
    shard1 = _dump_xml(
        [
            (1, "Berlin", 0, "Stadt [[Deutschland]]"),
            (2, "Kategorie:X", 14, "skip me"),
            (3, "Kafka", 0, "Autor {{bio}}"),
        ]
    )
    shard2 = _dump_xml([(4, "Wien", 0, "Stadt")])
    (tmp_path / "dump1.xml").write_bytes(shard1)
    (tmp_path / "dump2.xml").write_bytes(shard2)

    df = read_wiki_xml(spark, str(tmp_path)).toPandas()
    assert sorted(df.page_id) == [1, 3, 4]  # ns=14 dropped
    assert set(df.title) == {"Berlin", "Kafka", "Wien"}
    assert df.set_index("page_id").loc[1, "text"] == "Stadt [[Deutschland]]"


def test_wiki_xml_namespace_validation(spark, tmp_path):
    bad = b'<mediawiki xmlns="http://wrong/ns"><page/></mediawiki>'
    (tmp_path / "bad.xml").write_bytes(bad)
    assert not validate_namespace(bad)
    with pytest.raises(Exception, match="namespace"):
        read_wiki_xml(spark, str(tmp_path)).collect()


def test_read_warcish(spark, tmp_path):
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Target-URI: https://a.example/x\r\n"
        b"WARC-Date: 2024-03-01T12:00:00Z\r\n"
        b"Content-Language: de\r\n"
        b"\r\n"
        b"<html>Hallo [[Welt]]</html>\r\n"
        b"WARC/1.0\r\n"
        b"WARC-Target-URI: https://b.example/y\r\n"
        b"WARC-Date: 2024-03-02T08:30:00Z\r\n"
        b"\r\n"
        b"plain text body\r\n"
    )
    (tmp_path / "shard0.warc").write_bytes(rec)
    df = read_warcish(spark, str(tmp_path)).toPandas().sort_values("url")
    assert list(df.url) == ["https://a.example/x", "https://b.example/y"]
    assert list(df.lang) == ["de", "und"]
    assert df.iloc[0]["text"] == "<html>Hallo [[Welt]]</html>"
    assert bytes(df.iloc[0]["html"]) == b"<html>Hallo [[Welt]]</html>"
    assert str(df.iloc[0]["warc_ts"]).startswith("2024-03-01 12:00:00")