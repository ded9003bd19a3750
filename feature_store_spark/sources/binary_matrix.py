"""Row-major float32 matrix files -> DataFrame (SURVEY.md §2.1 S9).

The reference's runtime loads candidate matrices from raw row-major
f32 files, inferring n_items from the byte length
(runtime/src/dataset.rs:139-166). Spark shape: ``binaryFile`` source +
Arrow ``mapInPandas`` reshape — one file per task, schema
(item_index, features array<float>), dimension validation per file.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_f32_matrix(
    spark: SparkSession,
    path: str,
    num_features: int,
) -> DataFrame:
    """Load row-major float32 file(s) into (file, item_index, features).

    Byte length must be a multiple of 4*num_features per file
    (dataset.rs:105-119 validation); violating files raise.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            for _, row in pdf.iterrows():
                buf = row["content"]
                if len(buf) % (4 * num_features) != 0:
                    raise ValueError(
                        f"{row['path']}: {len(buf)} bytes is not a multiple of "
                        f"4*{num_features}"
                    )
                mat = np.frombuffer(buf, dtype="<f4").reshape(-1, num_features)
                yield pd.DataFrame(
                    {
                        "file": row["path"],
                        "item_index": np.arange(mat.shape[0], dtype="int64"),
                        "features": [r.astype("float32") for r in mat],
                    }
                )

    binary = spark.read.format("binaryFile").load(path).select("path", "content")
    return binary.mapInPandas(
        decode, schema="file string, item_index long, features array<float>"
    )


def matrix_min_max(df: DataFrame, num_features: int) -> DataFrame:
    """Per-feature min/max over the candidate matrix (A2,
    dataset.rs:60-77) — posexplode + grouped agg.

    ``num_features`` is VALIDATED per row (review r10: it used to be
    accepted and ignored, so a ragged/mis-sized row silently minted
    extra or missing ``dim`` groups instead of an error — the same
    loud-width contract load_f32_matrix enforces at decode time)."""
    # the guard sits ON the exploded column (a side `withColumn` would
    # be pruned away unevaluated): wrong-width rows raise inside the
    # same projection that reads the features
    # coalesce the size: size(NULL) is NULL, which would null the
    # whole concat and raise with a blank, diagnostic-free message
    # (review r10h) — a NULL features row now names itself
    sz = F.coalesce(F.size("features").cast("string"), F.lit("NULL"))
    checked = F.when(
        F.size("features") == int(num_features), F.col("features")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("matrix_min_max: row has "),
                sz,
                F.lit(f" features, expected {int(num_features)}"),
            )
        )
    )
    dims = df.select(F.posexplode(checked).alias("dim", "x"))
    return dims.groupBy("dim").agg(
        F.min("x").alias("min_value"), F.max("x").alias("max_value")
    )
