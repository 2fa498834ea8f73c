"""Python UDTF surface (Spark 4): table-valued functions as the
row-to-rows extension point.

The reference's only extension surface is a registry of named worker
functions (api-runner.rkt:19-22, SURVEY.md §2.B "UDF/UDAF/UDTF" row).
The engine exposes Spark's full ladder: scalar pandas_udf
(functions.markdown), grouped-map applyInPandas (streaming dedup),
mapInPandas (multimodal decode), a Python DataSource (sources.
datasource) — and here the UDTF: one input row -> N output rows with
schema, usable in FROM/LATERAL position from SQL.

Kept oracle-checkable: tokenization is lower + trim + split on \\s+
(RE2-compatible, no lookbehind), so DuckDB reproduces the exact rows
with regexp_split_to_array + generate_series.

Scale posture: UDTFs run Arrow-batched (useArrow) but are still the
Python slow path — the built-in twin is explode(word_shingles(...))
(operators.relational_ext.explode_tokens); this operator exists to
prove the extension surface, and the plan is embarrassingly parallel
(no shuffle: generator output stays in the producing task).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from cuttlefish_spark.io import load_table
from cuttlefish_spark.registry import query

try:  # Arrow-optimized UDTFs need pyarrow (baked into this container)
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string", useArrow=True)
    class NGramGenerator:
        """Emit (position, n-gram) rows from whitespace tokens.

        Tokenization contract (mirrored in the DuckDB oracle):
        lower -> trim -> split \\s+ -> drop empties."""

        def eval(self, text: str, n: int):  # noqa: D102 - contract above
            if text is None or n is None or n < 1:
                return
            toks = [t for t in re.split(r"\s+", text.lower().strip()) if t]
            for i in range(len(toks) - n + 1):
                yield i, " ".join(toks[i : i + n])

except ImportError:  # pragma: no cover
    NGramGenerator = None


@query(
    "udtf_ngrams",
    layer="C",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
        WHERE doc_id <= 100
    )
    SELECT doc_id,
           CAST(i - 1 AS INTEGER) AS pos,
           array_to_string(w[i:i+1], ' ') AS ngram
    FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks)
    """,
)
def udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram generation through a Python UDTF in LATERAL position —
    the table-valued extension surface, Arrow-batched, shuffle-free
    (each task expands its own rows in place)."""
    spark.udtf.register("doc_ngrams", NGramGenerator)
    load_table(spark, sf_dir, "documents").filter("doc_id <= 100").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.ngram "
        "FROM _udtf_docs d, LATERAL doc_ngrams(d.text, 2) t"
    )


_GEOMEAN_ORACLE = """
    SELECT event_type,
           round(exp(avg(ln(value))), 4) AS geomean,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE value > 0
    GROUP BY event_type
"""


@query("udaf_geomean", layer="B", oracle=_GEOMEAN_ORACLE)
def udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom AGGREGATE through the pandas grouped-agg UDF — the one
    rung of the extension ladder (scalar pandas_udf, grouped-map,
    mapInPandas, UDTF, DataSource, applyInPandasWithState) not yet
    exercised: per-group geometric mean of event values, a
    user-defined reduction Spark has no built-in for.

    The UDAF receives each group's column as ONE Arrow-backed pandas
    Series and returns a scalar — numpy does log/mean vectorized. At
    scale the caveat is honest: grouped-agg UDFs materialize the whole
    group in memory (no partial aggregation), so for skew-prone keys
    the production form is the algebraic rewrite exp(avg(ln(x))) —
    pure built-ins with map-side partials — which is exactly what the
    oracle states; this query exists to prove the custom-UDAF surface
    against it. round(4) absorbs the accumulation-order difference
    between numpy's pairwise mean and the engines' streaming avg.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _geomean(v):
        return float(np.exp(np.log(v.to_numpy()).mean()))

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf cannot introspect — attach real type objects instead.
    _geomean.__annotations__ = {"v": pd.Series, "return": float}
    geomean = pandas_udf("double")(_geomean)

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    # A grouped-agg pandas UDF cannot share an agg() with built-in
    # aggregates — Spark plans them through different operators — so
    # the count comes from a second tiny aggregation joined back.
    g = ev.groupBy("event_type").agg(F.round(geomean("value"), 4).alias("geomean"))
    n = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return g.join(F.broadcast(n), "event_type").select("event_type", "geomean", "n")
