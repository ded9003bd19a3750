"""Feature registry: entities / features / feature views / members as
plain DataFrames (Parquet/Delta tables in production), plus the
schema-hash contract (SURVEY.md §1.1, §2.8 X1).

The reference keeps these in PostgreSQL (V1__init.sql) behind a Spring
service (FeatureRegistryService.java); here the registry is data like
everything else, so registry queries are DataFrame queries and the
audit trail is an append-only table (Delta history gives it for free).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from feature_store_spark.functions import schema_hash_py
from feature_store_spark.session import local_rows_df

FEATURE_STATUSES = ("DRAFT", "ACTIVE", "DEPRECATED", "ARCHIVED")  # V1__init.sql:33-34


@dataclass
class FeatureView:
    """A versioned, ordered feature list = a fixed vector schema
    (V1__init.sql:44-71). ``feature_names`` is position-ordered; the
    hash is the train/serve consistency contract.

    ``transforms`` honors the reference's declared-but-never-evaluated
    ``feature_view_members.transform`` / ``transform_params`` columns
    (V1__init.sql:66-67, SURVEY.md §2.12): a SQL expression template
    per feature, applied at materialization. The template references
    the raw value as ``{col}`` and named parameters from
    ``transform_params[name]``, e.g. ``"log1p({col})"`` or
    ``"least(greatest({col}, {lo}), {hi})"`` with params
    ``{"lo": 0, "hi": 50}``."""

    name: str
    version: int
    entity: str
    feature_names: list[str] = field(default_factory=list)
    defaults: dict[str, float] = field(default_factory=dict)
    transforms: dict[str, str] = field(default_factory=dict)
    transform_params: dict[str, dict] = field(default_factory=dict)

    @property
    def vector_length(self) -> int:
        return len(self.feature_names)

    @property
    def schema_hash(self) -> int:
        return schema_hash_py(self.feature_names)


class Registry:
    """In-memory registry with DataFrame views; persist with
    :meth:`save` (Parquet) for a multi-session deployment."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._entities: list[tuple] = []
        self._features: list[tuple] = []
        self._views: dict[tuple[str, int], FeatureView] = {}
        self._audit: list[tuple] = []

    def _log(self, entity_type: str, ref_id: str, event_type: str, details: str):
        """Append-only lifecycle audit (V1__init.sql:74-82,
        FeatureRegistryService.java:260-279). ``occurred_seq`` is a
        deterministic monotone sequence instead of wall-clock so runs
        are reproducible; a production deployment would also stamp
        current_timestamp()."""
        self._audit.append(
            (len(self._audit), entity_type, ref_id, event_type, "system", details)
        )

    def register_entity(self, name: str, join_key: str, join_key_type: str = "STRING"):
        self._entities.append((name, join_key, join_key_type))
        self._log("ENTITY", name, "CREATED", f"join_key={join_key}")
        return self

    def register_feature(
        self,
        name: str,
        entity: str,
        dtype: str = "FLOAT64",
        default_value: float = 0.0,
        max_age_seconds: int | None = None,
        status: str = "ACTIVE",
        version: int = 1,
    ):
        assert status in FEATURE_STATUSES
        row = (
            name, entity, dtype, float(default_value),
            max_age_seconds, status, version,
        )
        prev = next(
            (
                f for f in self._features
                if f[0] == name and f[6] == version
            ),
            None,
        )
        if prev is not None:
            if prev == row:  # idempotent re-register (setup re-runs)
                return self
            # same immutability contract as register_view (review
            # r10m): duplicate (name, version) rows made
            # latest_features' winner partition-order-dependent
            raise ValueError(
                f"register_feature: {name!r} v{version} is already "
                "registered with a different definition — a "
                "published version is immutable; register a new "
                "version"
            )
        self._features.append(row)
        self._log("FEATURE", name, "CREATED", f"entity={entity} v{version} {status}")
        return self

    def set_feature_status(self, name: str, version: int, status: str):
        """Lifecycle transition (DRAFT -> ACTIVE -> DEPRECATED ->
        ARCHIVED, V1__init.sql:33-34), audited. Raises on an unknown
        (name, version) — a typo'd transition must not silently no-op
        while still writing an audit row claiming it happened."""
        assert status in FEATURE_STATUSES
        if not any(
            n == name and v == version
            for (n, _e, _d, _dv, _ma, _st, v) in self._features
        ):
            raise KeyError(
                f"set_feature_status: no feature {name!r} v{version}"
            )
        self._features = [
            (n, e, d, dv, ma, status if (n == name and v == version) else st, v)
            for (n, e, d, dv, ma, st, v) in self._features
        ]
        self._log("FEATURE", name, f"STATUS_{status}", f"v{version}")
        return self

    def register_view(self, view: FeatureView):
        """A published (name, version) is IMMUTABLE (review r10): its
        schema hash is the train/serve consistency contract, so
        re-registering the same version with a DIFFERENT definition
        raises instead of silently replacing it (and logging a second
        CREATED audit row for a mutation). An identical re-register
        is an idempotent no-op — pipeline setup code re-runs."""
        import json as _json

        stray = sorted(
            (set(view.transforms) | set(view.transform_params)
             | set(view.defaults)) - set(view.feature_names)
        )
        if stray:
            # save/load persists these maps BY MEMBER, so an entry
            # keyed off-schema would silently vanish on the round
            # trip and the reloaded view would fail the idempotent
            # re-register equality (review r10m) — refuse the typo
            raise ValueError(
                f"register_view: {view.name!r} v{view.version} has "
                f"transforms/params/defaults for non-member feature "
                f"name(s) {stray}"
            )
        # canonicalize params through JSON (tuples -> lists, key
        # order) so the saved/loaded view compares EQUAL to the
        # registered one instead of tripping the immutability check —
        # into a COPY, not the caller's object (ADVICE r10: mutating
        # view.transform_params in place surprised callers who kept
        # using their FeatureView after registration)
        import dataclasses as _dc

        view = _dc.replace(
            view,
            transform_params={
                k: _json.loads(_json.dumps(v))
                for k, v in view.transform_params.items()
            },
        )
        key = (view.name, view.version)
        prev = self._views.get(key)
        if prev is not None:
            if prev == view:  # dataclass eq: the FULL definition
                return self
            raise ValueError(
                f"register_view: {view.name!r} v{view.version} is "
                f"already published (schema hash {prev.schema_hash}) "
                "with a different definition — a published version is "
                "immutable; register a new version"
            )
        self._views[key] = view
        self._log(
            "FEATURE_VIEW",
            view.name,
            "CREATED",
            f"v{view.version} len={view.vector_length} hash={view.schema_hash}",
        )
        return self

    def get_view(self, name: str, version: int | None = None) -> FeatureView:
        """version=None -> latest (findFirstByNameOrderByVersionDesc,
        FeatureRegistryService.java:188)."""
        if version is not None:
            try:
                return self._views[(name, version)]
            except KeyError:
                raise KeyError(
                    f"get_view: no view {name!r} v{version}"
                ) from None
        versions = [v for (n, v) in self._views if n == name]
        if not versions:
            # a named KeyError, not max()'s opaque empty-sequence
            # ValueError (review r10) — same contract as
            # set_feature_status for the same typo class
            raise KeyError(f"get_view: no view named {name!r}")
        return self._views[(name, max(versions))]

    # ---- DataFrame projections (registry queries, §2.4 F3) ----

    def entities_df(self) -> DataFrame:
        return local_rows_df(
            self.spark,
            self._entities,
            "name string, join_key string, join_key_type string",
        )

    def features_df(self) -> DataFrame:
        return local_rows_df(
            self.spark,
            self._features,
            "name string, entity string, dtype string, default_value double, "
            "max_age_seconds long, status string, version int",
        )

    def active_features(self) -> DataFrame:
        return self.features_df().filter(F.col("status") == "ACTIVE")

    def latest_features(self) -> DataFrame:
        w = Window.partitionBy("name").orderBy(F.col("version").desc())
        return (
            self.features_df()
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def views_df(self) -> DataFrame:
        rows = [
            (v.name, v.version, v.entity, v.vector_length, v.schema_hash)
            for v in self._views.values()
        ]
        return local_rows_df(
            self.spark,
            rows,
            "name string, version int, entity string, vector_length int, "
            "schema_hash long",
        )

    def members_df(self) -> DataFrame:
        import json

        rows = [
            (
                v.name,
                v.version,
                pos,
                fname,
                v.transforms.get(fname),
                json.dumps(v.transform_params[fname])
                if fname in v.transform_params
                else None,
                # the view's serving default rides along so save/load
                # round-trips it — losing it would silently serve 0.0
                # where the view declared another fill value
                v.defaults.get(fname),
            )
            for v in self._views.values()
            for pos, fname in enumerate(v.feature_names)
        ]
        return local_rows_df(
            self.spark,
            rows,
            "view_name string, view_version int, position int, "
            "feature_name string, transform string, transform_params string, "
            "default_value double",
        )

    def audit_df(self) -> DataFrame:
        return local_rows_df(
            self.spark,
            self._audit,
            "occurred_seq long, entity_type string, ref_id string, "
            "event_type string, actor string, details string",
        )

    def recent_events(self, n: int = 20) -> DataFrame:
        """Most recent lifecycle events (T5: order desc + limit,
        FeatureRegistryService.java:273-279)."""
        return self.audit_df().orderBy(F.col("occurred_seq").desc()).limit(n)

    # ---- persistence (one parquet table per registry relation) ----

    _TABLES = ("entities", "features", "views", "members", "audit")

    def save(self, path: str) -> None:
        """Persist the registry as parquet tables (Delta in
        production, where table history doubles as the audit)."""
        dfs = {
            "entities": self.entities_df(),
            "features": self.features_df(),
            "views": self.views_df(),
            "members": self.members_df(),
            "audit": self.audit_df(),
        }
        for name, df in dfs.items():
            df.write.mode("overwrite").parquet(f"{path}/{name}")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Registry":
        reg = cls(spark)
        reg._entities = [
            (r.name, r.join_key, r.join_key_type)
            for r in spark.read.parquet(f"{path}/entities").collect()
        ]
        reg._features = [
            (r.name, r.entity, r.dtype, r.default_value, r.max_age_seconds,
             r.status, r.version)
            for r in spark.read.parquet(f"{path}/features").collect()
        ]
        members = spark.read.parquet(f"{path}/members").collect()
        by_view: dict[tuple[str, int], list] = {}
        for m in members:
            by_view.setdefault((m.view_name, m.view_version), []).append(m)
        import json

        for r in spark.read.parquet(f"{path}/views").collect():
            ms = sorted(by_view.get((r.name, r.version), []),
                        key=lambda m: m.position)
            names = [m.feature_name for m in ms]
            transforms = {
                m.feature_name: m.transform
                for m in ms
                if getattr(m, "transform", None)
            }
            tparams = {
                m.feature_name: json.loads(m.transform_params)
                for m in ms
                if getattr(m, "transform_params", None)
            }
            defaults = {
                m.feature_name: float(m.default_value)
                for m in ms
                if getattr(m, "default_value", None) is not None
            }
            reg._views[(r.name, r.version)] = FeatureView(
                r.name, r.version, r.entity, names, defaults=defaults,
                transforms=transforms, transform_params=tparams,
            )
        reg._audit = [
            (r.occurred_seq, r.entity_type, r.ref_id, r.event_type, r.actor, r.details)
            for r in spark.read.parquet(f"{path}/audit")
            .orderBy("occurred_seq")
            .collect()
        ]
        return reg
