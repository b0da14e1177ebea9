"""Independent DuckDB oracle: replay change events in seq order → final state.

≙ the reference's golden-count assertions (JobLauncherTestHelper.java:86-92)
upgraded to full-table content equality via per-row sha256 (BASELINE.json
input_hint invariant).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

FINAL_STATE_SQL = """
WITH ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY repo, path ORDER BY seq DESC) AS rn
  FROM events_in
  WHERE op IN ('I','U','D')
)
SELECT repo, path, commit, lang, content
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def expected_final_pdf(events_pdf: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("events_in", events_pdf)
    out = con.execute(FINAL_STATE_SQL).df()
    con.close()
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


def table_digest(pdf: pd.DataFrame) -> pd.Series:
    """Per-row sha256 over the sorted, canonicalized frame."""
    import hashlib

    pdf = pdf.sort_values(["repo", "path"]).reset_index(drop=True)
    cols = sorted(pdf.columns)

    def row_sha(row):
        payload = "|".join("" if pd.isna(row[c]) else str(row[c]) for c in cols)
        return hashlib.sha256(payload.encode()).hexdigest()

    return pdf.apply(row_sha, axis=1)


def assert_frames_equal_by_sha(actual: pd.DataFrame, expected: pd.DataFrame):
    assert len(actual) == len(expected), (
        f"row count mismatch: {len(actual)} vs {len(expected)}"
    )
    a = sorted(table_digest(actual).tolist())
    e = sorted(table_digest(expected).tolist())
    assert a == e, "per-row sha256 mismatch vs oracle replay"


def assert_matches_oracle(result_df: DataFrame, events_df: DataFrame):
    events_pdf = events_df.toPandas()
    expected = expected_final_pdf(events_pdf)
    actual = result_df.toPandas()
    assert_frames_equal_by_sha(actual, expected)
