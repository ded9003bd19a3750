"""Scoring-runtime dataset management (SURVEY.md Appendix A, runtime
surface): the reference's ``DatasetManager`` holds named candidate
matrices in memory with a capacity cap, dimension validation, and an
info endpoint (``runtime/src/dataset.rs:24-35,60-77,105-119,168-170``;
cap ``runtime/src/config.rs:19-21``). Spark-side, a "dataset" is a
cached DataFrame with a fixed ordered feature-column list; info's
per-feature ranges (A2) are one distributed min/max pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DatasetError(ValueError):
    pass


@dataclass
class DatasetInfo:
    name: str
    n_items: int
    feature_cols: list[str]
    ranges: dict[str, tuple[float, float]] = field(default_factory=dict)

    @property
    def n_features(self) -> int:
        return len(self.feature_cols)


class DatasetManager:
    """Named candidate datasets for batch scoring.

    - ``load`` registers (and caches) a DataFrame under a name;
      loading an existing name is an error, ``replace`` swaps it
      (dataset.rs replace semantics) and unpersists the old one.
    - capacity-capped (default 16, config.rs:19-21) — the cap bounds
      executor cache memory exactly like the reference bounds host RAM.
    - ``info`` returns item count + per-feature min/max (the
      GetDatasetInfo response, grpc_service.rs:372-404) in ONE
      aggregate pass.
    - ``validate_dims`` checks a model's expected feature count
      against the dataset (dataset.rs:105-119).
    """

    def __init__(self, max_datasets: int = 16):
        self.max_datasets = max_datasets
        self._datasets: dict[str, tuple[DataFrame, list[str]]] = {}

    def load(
        self, name: str, df: DataFrame, feature_cols: list[str], cache: bool = True
    ) -> None:
        if name in self._datasets:
            raise DatasetError(f"dataset '{name}' already loaded; use replace()")
        if len(self._datasets) >= self.max_datasets:
            raise DatasetError(
                f"capacity {self.max_datasets} reached; unload something first"
            )
        missing = [c for c in feature_cols if c not in df.columns]
        if missing:
            raise DatasetError(f"feature columns not in dataset: {missing}")
        if cache:
            df = df.cache()
        self._datasets[name] = (df, list(feature_cols))

    def replace(self, name: str, df: DataFrame, feature_cols: list[str]) -> None:
        """Swap a dataset atomically (dataset.rs replace semantics): the
        new frame is validated BEFORE the old one is dropped, so a
        failed replace (missing feature column) leaves the existing
        dataset untouched rather than lost."""
        missing = [c for c in feature_cols if c not in df.columns]
        if missing:
            raise DatasetError(f"feature columns not in dataset: {missing}")
        old = self._datasets.pop(name, None)
        if old is not None:
            try:
                old[0].unpersist()
            except Exception:
                pass
        self.load(name, df, feature_cols)

    def unload(self, name: str) -> None:
        if name not in self._datasets:
            raise DatasetError(f"no dataset '{name}'")
        df, _ = self._datasets.pop(name)
        try:
            df.unpersist()
        except Exception:
            pass

    def get(self, name: str) -> DataFrame:
        if name not in self._datasets:
            raise DatasetError(f"no dataset '{name}'")
        return self._datasets[name][0]

    def feature_cols(self, name: str) -> list[str]:
        if name not in self._datasets:
            raise DatasetError(f"no dataset '{name}'")
        return list(self._datasets[name][1])

    def list_datasets(self) -> list[str]:
        return sorted(self._datasets)

    def validate_dims(self, name: str, expected_features: int) -> None:
        cols = self.feature_cols(name)
        if len(cols) != expected_features:
            raise DatasetError(
                f"dataset '{name}' has {len(cols)} features, model expects "
                f"{expected_features}"
            )

    def info(self, name: str) -> DatasetInfo:
        if name not in self._datasets:
            raise DatasetError(f"no dataset '{name}'")
        df, cols = self._datasets[name]
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            # df[c], not F.min(c): a raw string name containing a dot
            # would parse as a struct path (review r10m)
            aggs.append(F.min(df[c]).alias(f"__min_{c}"))
            aggs.append(F.max(df[c]).alias(f"__max_{c}"))
        row = df.agg(*aggs).collect()[0]
        # all-null feature columns aggregate to None min/max; surface
        # them as NaN ranges instead of raising TypeError on float(None)
        ranges = {}
        for c in cols:
            lo, hi = row[f"__min_{c}"], row[f"__max_{c}"]
            ranges[c] = (
                float(lo) if lo is not None else float("nan"),
                float(hi) if hi is not None else float("nan"),
            )
        return DatasetInfo(
            name=name,
            n_items=row["__n"],
            feature_cols=list(cols),
            ranges=ranges,
        )
