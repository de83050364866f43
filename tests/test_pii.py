"""PII scrub: exact counts and redactions on hand-built text."""

from pyspark.sql import functions as F

from graphina_spark.functions.pii import pii_scrub, plant_pii, scrub_expr


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_scrub_replaces_every_match(spark):
    out = _docs(
        spark,
        ["mail a.b+c@ex-1.org now, cc x@y.io; ip 10.0.0.1 tel +1-555-0199"],
    ).select(scrub_expr(F.col("text")).alias("s")).first()["s"]
    assert out == "mail <EMAIL> now, cc <EMAIL>; ip <IP> tel <PHONE>"


def test_counts_and_clean_text(spark):
    rows = pii_scrub(
        _docs(spark, ["no pii here", "a@b.co and 1.2.3.4 and +44-123-4567"])
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert (by_id[0]["n_emails"], by_id[0]["n_ips"], by_id[0]["n_phones"]) == (0, 0, 0)
    assert by_id[0]["n_redacted_chars"] == 0
    assert (by_id[1]["n_emails"], by_id[1]["n_ips"], by_id[1]["n_phones"]) == (1, 1, 1)


def test_ip_word_boundary(spark):
    # a leading digit glued to a letter is not a boundary → no match
    rows = pii_scrub(_docs(spark, ["build a1.2.3.4 end"])).collect()
    assert rows[0]["n_ips"] == 0
    # a 5-octet run still redacts its first four (documented \b behavior)
    rows = pii_scrub(_docs(spark, ["v 1.2.3.4.5 end"])).collect()
    assert rows[0]["n_ips"] == 1


def test_plant_pii_deterministic_and_countable(spark):
    planted = plant_pii(_docs(spark, ["x", "y", "z", "w"]))
    rows = {r["doc_id"]: r for r in pii_scrub(planted).collect()}
    # doc 0 and 3 (id % 3 == 0) carry the extra cc email
    assert rows[0]["n_emails"] == 2 and rows[3]["n_emails"] == 2
    assert rows[1]["n_emails"] == 1 and rows[2]["n_emails"] == 1
    assert all(r["n_ips"] == 1 and r["n_phones"] == 1 for r in rows.values())
    # idempotent planting text: same input → same md5
    again = {r["doc_id"]: r for r in pii_scrub(plant_pii(_docs(spark, ["x", "y", "z", "w"]))).collect()}
    assert {k: v["clean_md5"] for k, v in rows.items()} == {
        k: v["clean_md5"] for k, v in again.items()
    }
