"""PII scrub: hit counts by construction, clean redacted output."""

import re

from pyspark.sql import functions as F

from data_model_spark.operators.pii import (
    EMAIL_RE,
    PHONE_RE,
    URL_RE,
    augment_with_pii,
    pii_scrub,
)
from data_model_spark.sources.tables import load_table


def test_counts_match_injection_residues(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = pii_scrub(augment_with_pii(docs)).toPandas().set_index("doc_id")
    assert len(out) == docs.count()
    for doc_id, row in out.iterrows():
        assert row.n_emails == (1 if doc_id % 3 == 0 else 0), doc_id
        assert row.n_phones == (1 if doc_id % 5 == 0 else 0), doc_id
        assert row.n_urls == (1 if doc_id % 7 == 0 else 0), doc_id
    # non-vacuous: every pattern fires somewhere
    assert out.n_emails.sum() > 0 and out.n_phones.sum() > 0
    assert out.n_urls.sum() > 0


def test_redacted_text_is_clean(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    aug = augment_with_pii(docs)
    red = aug.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("aug", EMAIL_RE, "<EMAIL>"),
                PHONE_RE,
                "<PHONE>",
            ),
            URL_RE,
            "<URL>",
        ).alias("redacted"),
    ).toPandas()
    for pat in (EMAIL_RE, PHONE_RE, URL_RE):
        rx = re.compile(pat)
        assert not red.redacted.map(lambda t: bool(rx.search(t))).any(), pat
    # tokens actually substituted where injected
    hit = red[red.doc_id % 3 == 0].redacted
    assert hit.str.contains("<EMAIL>").all()
