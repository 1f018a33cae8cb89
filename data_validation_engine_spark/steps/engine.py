"""The Spark step engine: one method per step type, all lazy DataFrame ops.

Design notes (vs reference, for the parity audit):

- Dispatch: config type -> handler (dve base/rules.py:97-203 uses reflection
  over type hints; here an explicit registry — same contract).
- Joins are theta joins on SQL conditions (dve spark/rules.py:144-166);
  Catalyst picks broadcast/hash/sort-merge/nested-loop. Column-conflict
  resolution is last-wins, case-insensitive, preserving last casing
  (dve spark/rules.py:168-208).
- Integrity checks (one_to_one_join / has_match): the reference runs TWO
  count() actions (dve spark/rules.py:217-227, 250-259); here a single
  aggregation over a per-row id computes (total, distinct) in ONE action.
- join_header: the reference collects the header row to the driver and
  rebuilds it as a literal (dve spark/rules.py:272-297); here it stays
  distributed — ``crossJoin(broadcast(header struct))``.
- identify_orphans: the reference shuffles twice (groupBy + join-back,
  dve spark/rules.py:339-374); here one groupBy over a per-row id
  reconstructs the row with ``first()`` — single shuffle, no join-back.
- notify: the reference loops rows on the driver (``toLocalIterator``,
  dve spark/rules.py:400-420); here messages are a DataFrame with the
  template compiled to a ``concat`` Column (messages.py).
"""

from __future__ import annotations

import uuid
from typing import Callable, MutableMapping, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_validation_engine_spark.errors import ConfigurationError, ConstraintError
from data_validation_engine_spark.exprs import parse_multiple_expressions
from data_validation_engine_spark.messages import (
    MessageCollector,
    messages_for_failures,
)
from data_validation_engine_spark.steps.configs import (
    AbstractJoin,
    AbstractNewColumnJoin,
    Aggregation,
    AntiJoin,
    AnyStep,
    ColumnAddition,
    ColumnRemoval,
    ConfirmJoinHasMatch,
    ConnectedComponents,
    CopyEntity,
    DeferredFilter,
    EmbeddingNearDup,
    EntityRemoval,
    ExactDedup,
    HeaderJoin,
    ImmediateFilter,
    InnerJoin,
    LanguageId,
    LeftJoin,
    MinHashDedup,
    Notification,
    OneToOneJoin,
    OrphanIdentification,
    QualityFilters,
    RenameEntity,
    SelectColumns,
    SemiJoin,
    Sessionize,
    AsofJoin,
    HashSample,
    HashSplit,
    StratifiedSample,
    NgramJaccardPairs,
    SimHashPairs,
    SimHashSignatures,
    SimilarityTopK,
    TableUnion,
    TextFingerprint,
    TextStats,
    TfIdfTopTerms,
    IntervalJoin,
    TopKPerGroup,
    RollingAggregate,
    IncrementalDedup,
    ContainmentPairs,
    WeightedSample,
    RepetitionStats,
    PiiScrub,
    Decontaminate,
    ChunkDocuments,
    PackSequences,
    LabelCentroids,
    NearestCentroid,
    BuildVocab,
    KMeansFit,
    KnnJoin,
    ApproxDistinct,
    GroupedQuantiles,
    ProfileColumns,
    FuzzyJoin,
    Bm25Search,
    PageRankStep,
    EncodeTokens,
    ProfileGate,
    FrequentItems,
    ProfileDiff,
    QuantileBuckets,
    OutlierFlags,
    MergeUpsert,
    ApplyChanges,
    TriangleCount,
    ParagraphDedup,
    SemanticDedup,
    PcaProject,
    HllProfile,
    LmPerplexity,
    SharedSpans,
    GroupedAuc,
    SampledQuantiles,
    QuantizeVectors,
    SaltedJoin,
    ProjectVectors,
    CorpusMix,
    SnapshotDiff,
    Scd2Build,
    ExactQuotaSample,
    Winsorize,
    Impute,
    KmvSetOps,
    RetentionCohorts,
    WindowFunnel,
    Unpivot,
    Chi2Drift,
    GroupedRegression,
    EcdfNormalize,
    BucketByLength,
    SqlQuery,
    BpeTrain,
    BpeEncode,
    Repartition,
    Pseudonymize,
    ClusterRepresentatives,
    RenderChat,
    ConversationStats,
    NormalizeText,
    BloomFilter,
    CmsSketch,
    DsirResample,
    NegativeSamples,
    RrfFuse,
    ExtractHtmlText,
    ExtractAnchorTexts,
    ExtractLinks,
    HardNegativeSamples,
    ClassifierFit,
    ClassifierScore,
    ClassifierEval,
    CompactMinhashIndex,
    RemoveRepeatedSubstrings,
    HeavyHitters,
    InterleaveSources,
    WindowedHeavyHitters,
    PQFit,
    AnnRecall,
    PQTopKMany,
    PQEncode,
    GopherQualityFlags,
    GopherRepetitionFlags,
    C4Clean,
    UrlBlocklist,
    PairRecall,
    WordLm,
    MojibakeStats,
    FixMojibake,
    ParseRobots,
    RobotsAllowed,
    ParseJson,
    MaterializePacks,
    CompressionRatio,
    Standardize,
    SplitSentences,
    ChunkByContent,
    ChunkBySentences,
    ScriptProfile,
    SelectTokenBudget,
)

Entities = MutableMapping[str, DataFrame]
Messages = Optional[DataFrame]


def _qcol(name: str) -> Column:
    return F.col(f"`{name}`")


def _truthy(expression: str) -> Column:
    """SQL expression -> non-null boolean Column (null => false)."""
    return F.coalesce(F.expr(expression).cast("boolean"), F.lit(False))


class StepEngine:
    """Evaluates step configs against an entity namespace.

    Stateless between calls apart from the SparkSession and the registered
    SQL function library; safe to share across threads (Spark sessions are
    thread-safe for job submission).
    """

    def __init__(self, spark: SparkSession, *, register_functions: bool = True):
        self.spark = spark
        self._persisted: list[DataFrame] = []
        if register_functions:
            # engine's scalar function library becomes callable in rule SQL
            from data_validation_engine_spark.functions.library import (
                register_all_functions,
            )

            register_all_functions(spark)

        self._handlers: dict[type, Callable[..., Messages]] = {
            ColumnAddition: self.add,
            ColumnRemoval: self.remove,
            SelectColumns: self.select,
            Aggregation: self.group_by,
            ImmediateFilter: self.filter,
            DeferredFilter: self.deferred_filter,
            Notification: self.notify,
            LeftJoin: self.left_join,
            InnerJoin: self.inner_join,
            OneToOneJoin: self.one_to_one_join,
            SemiJoin: self.semi_join,
            AntiJoin: self.anti_join,
            ConfirmJoinHasMatch: self.has_match,
            HeaderJoin: self.join_header,
            TableUnion: self.union,
            OrphanIdentification: self.identify_orphans,
            CopyEntity: self.copy_entity,
            RenameEntity: self.rename_entity,
            EntityRemoval: self.remove_entities,
            ExactDedup: self.dedup_exact,
            MinHashDedup: self.dedup_minhash,
            QualityFilters: self.quality_filters,
            SimilarityTopK: self.similarity_topk,
            EmbeddingNearDup: self.embedding_neardup,
            TextStats: self.text_stats,
            RepetitionStats: self.text_repetition,
            PiiScrub: self.pii_scrub,
            Decontaminate: self.decontaminate,
            ChunkDocuments: self.chunk_documents,
            PackSequences: self.pack_sequences,
            LabelCentroids: self.label_centroids,
            NearestCentroid: self.nearest_centroid,
            BuildVocab: self.build_vocab,
            KnnJoin: self.knn_join,
            KMeansFit: self.kmeans,
            LanguageId: self.lang_id,
            TfIdfTopTerms: self.tfidf_top_terms,
            TextFingerprint: self.text_fingerprint,
            SimHashSignatures: self.dedup_simhash,
            SimHashPairs: self.dedup_simhash_pairs,
            NgramJaccardPairs: self.dedup_ngram_pairs,
            HashSplit: self.hash_split,
            HashSample: self.hash_sample,
            StratifiedSample: self.stratified_sample,
            AsofJoin: self.asof_join,
            ConnectedComponents: self.connected_components,
            Sessionize: self.sessionize,
            IntervalJoin: self.interval_join,
            TopKPerGroup: self.top_k,
            RollingAggregate: self.rolling_agg,
            IncrementalDedup: self.dedup_incremental,
            ContainmentPairs: self.dedup_containment_pairs,
            WeightedSample: self.weighted_sample,
            ApproxDistinct: self.approx_distinct,
            GroupedQuantiles: self.grouped_quantiles,
            ProfileColumns: self.profile,
            FuzzyJoin: self.fuzzy_join,
            Bm25Search: self.bm25,
            PageRankStep: self.pagerank,
            EncodeTokens: self.encode_tokens,
            ProfileGate: self.profile_gate,
            FrequentItems: self.frequent_items,
            ProfileDiff: self.profile_diff,
            QuantileBuckets: self.quantile_buckets,
            OutlierFlags: self.outlier_flags,
            MergeUpsert: self.merge_upsert,
            ApplyChanges: self.apply_changes,
            TriangleCount: self.triangle_count,
            ParagraphDedup: self.paragraph_dedup,
            SemanticDedup: self.semantic_dedup,
            PcaProject: self.pca_project,
            HllProfile: self.hll_profile,
            LmPerplexity: self.lm_perplexity,
            SharedSpans: self.shared_spans,
            GroupedAuc: self.grouped_auc,
            SampledQuantiles: self.sampled_quantiles,
            QuantizeVectors: self.quantize_vectors,
            SaltedJoin: self.salted_join,
            ProjectVectors: self.project_vectors,
            CorpusMix: self.corpus_mix,
            SnapshotDiff: self.snapshot_diff,
            Scd2Build: self.scd2,
            ExactQuotaSample: self.exact_quota_sample,
            Winsorize: self.winsorize,
            Impute: self.impute,
            KmvSetOps: self.kmv_set,
            RetentionCohorts: self.retention_cohorts,
            WindowFunnel: self.window_funnel,
            Unpivot: self.unpivot,
            Chi2Drift: self.chi2_drift,
            GroupedRegression: self.grouped_regression,
            EcdfNormalize: self.ecdf_normalize,
            BucketByLength: self.bucket_by_length,
            SqlQuery: self.sql_query,
            BpeTrain: self.bpe_train,
            BpeEncode: self.bpe_encode,
            Repartition: self.repartition,
            Pseudonymize: self.pseudonymize,
            ClusterRepresentatives: self.cluster_representatives,
            RenderChat: self.render_chat,
            ConversationStats: self.conversation_stats,
            NormalizeText: self.normalize_text,
            CmsSketch: self.cms_sketch,
            BloomFilter: self.bloom_filter,
            DsirResample: self.dsir_resample,
            RrfFuse: self.rrf_fuse,
            NegativeSamples: self.negative_samples,
            ExtractHtmlText: self.extract_html_text,
            ExtractLinks: self.extract_links,
            ExtractAnchorTexts: self.extract_anchor_texts,
            ClassifierFit: self.classifier_fit,
            RemoveRepeatedSubstrings: self.remove_repeated_substrings,
            ClassifierScore: self.classifier_score,
            ClassifierEval: self.classifier_eval,
            CompactMinhashIndex: self.compact_minhash_index,
            WindowedHeavyHitters: self.windowed_heavy_hitters,
            PQFit: self.pq_fit,
            AnnRecall: self.ann_recall,
            PQTopKMany: self.pq_topk_many,
            PQEncode: self.pq_encode,
            GopherQualityFlags: self.gopher_quality_flags,
            GopherRepetitionFlags: self.gopher_repetition_flags,
            C4Clean: self.c4_clean,
            UrlBlocklist: self.url_blocklist,
            PairRecall: self.pair_recall,
            WordLm: self.word_lm,
            MojibakeStats: self.mojibake_stats,
            FixMojibake: self.fix_mojibake,
            HeavyHitters: self.heavy_hitters,
            InterleaveSources: self.interleave_sources,
            HardNegativeSamples: self.hard_negative_samples,
            ParseRobots: self.parse_robots,
            RobotsAllowed: self.robots_allowed,
            ParseJson: self.parse_json,
            MaterializePacks: self.materialize_packs,
            CompressionRatio: self.compression_ratio,
            Standardize: self.standardize,
            SplitSentences: self.split_sentences,
            ChunkBySentences: self.chunk_by_sentences,
            ChunkByContent: self.chunk_by_content,
            SelectTokenBudget: self.select_token_budget,
            ScriptProfile: self.script_profile,
        }

    # -- dispatch ----------------------------------------------------------
    def evaluate(self, entities: Entities, *, config: AnyStep) -> Messages:
        handler = self._handlers.get(type(config))
        if handler is None:
            raise ConfigurationError(f"unsupported step type {type(config).__name__}")
        return handler(entities, config=config)

    def run(
        self,
        entities: Entities,
        steps: list[AnyStep],
        *,
        persist_reused: bool = False,
        persist_threshold: int = 2,
    ) -> Messages:
        """Evaluate a list of steps in order; returns the unioned messages.

        ``persist_reused=True`` runs the driver-side ref-count pass
        (scale.entity_read_counts — the SURVEY §7 persist-placement hook)
        and persists every entity read by >= ``persist_threshold`` steps
        the first time it is seen, so an N-consumer lineage computes once
        instead of N times. Persists register with the engine's cache list
        — call :meth:`cleanup` when the run's outputs have been
        materialised. Opt-in: persisting trades executor memory for
        recompute, a call the optimizer cannot make statically.
        """
        from pyspark import StorageLevel

        from data_validation_engine_spark.scale import hot_entities

        hot = (
            hot_entities(steps, threshold=persist_threshold)
            if persist_reused
            else set()
        )
        pinned: set[int] = set()

        def _pin_hot() -> None:
            for name in hot & set(entities.keys()):
                frame = entities[name]
                if id(frame) not in pinned:
                    entities[name] = frame.persist(
                        StorageLevel.MEMORY_AND_DISK
                    )
                    self._persisted.append(entities[name])
                    pinned.add(id(entities[name]))

        _pin_hot()
        collector = MessageCollector()
        for step in steps:
            collector.add(self.evaluate(entities, config=step))
            if hot:
                _pin_hot()
        return collector.union()

    # -- column / projection ----------------------------------------------
    def add(self, entities: Entities, *, config: ColumnAddition) -> Messages:
        df = entities[config.entity_name]
        entities[config.output_name] = df.withColumn(
            config.column_name, F.expr(config.expression)
        )
        return None

    def remove(self, entities: Entities, *, config: ColumnRemoval) -> Messages:
        df = entities[config.entity_name]
        entities[config.output_name] = df.drop(config.column_name)
        return None

    def select(self, entities: Entities, *, config: SelectColumns) -> Messages:
        df = entities[config.entity_name]
        out = df.selectExpr(*parse_multiple_expressions(config.columns))
        if config.distinct:
            out = out.distinct()
        entities[config.output_name] = out
        return None

    def group_by(self, entities: Entities, *, config: Aggregation) -> Messages:
        df = entities[config.entity_name]
        group_exprs = [
            F.expr(e) for e in parse_multiple_expressions(config.group_by)
        ]
        agg_exprs = [
            F.expr(e)
            for e in parse_multiple_expressions(config.agg_columns or [])
        ]

        if config.grouping == "rollup":
            grouped = df.rollup(*group_exprs)
        elif config.grouping == "cube":
            grouped = df.cube(*group_exprs)
        else:
            grouped = df.groupBy(*group_exprs)
        if config.pivot_column:
            if config.grouping != "groups":
                raise ConfigurationError(
                    "pivot composes only with plain grouping"
                )
            if not agg_exprs:
                raise ConfigurationError("pivot requires agg_columns")
            # fixed pivot values avoid the extra distinct-values job
            grouped = grouped.pivot(config.pivot_column, config.pivot_values)
        if agg_exprs:
            out = grouped.agg(*agg_exprs)
        elif config.grouping != "groups":
            raise ConfigurationError(
                f"{config.grouping} requires agg_columns"
            )
        else:
            # aggregation with no agg expressions == distinct group keys
            out = df.select(*group_exprs).distinct()
        entities[config.output_name] = out
        return None

    # -- filters / notifications ------------------------------------------
    def filter(self, entities: Entities, *, config: ImmediateFilter) -> Messages:
        df = entities[config.entity_name]
        entities[config.output_name] = df.where(F.expr(config.expression))
        return None

    def deferred_filter(
        self, entities: Entities, *, config: DeferredFilter
    ) -> Messages:
        """A deferred filter evaluated standalone == a sync stage of one."""
        from data_validation_engine_spark.steps.sync_filters import (
            apply_sync_filters,
        )

        return apply_sync_filters(entities, [config])

    def notify(self, entities: Entities, *, config: Notification) -> Messages:
        df = entities[config.entity_name]
        # The predicate is evaluated on the FULL frame (excluded columns stay
        # visible to the expression); they are only omitted from the message
        # payload/template. Parity: dve spark/rules.py notify filters first
        # and drops excluded columns from the payload only — the sync stage
        # relies on expressions referencing excluded helper columns.
        predicate_fails_for_matches = ~_truthy(config.expression)
        return messages_for_failures(
            config.entity_name,
            df,
            predicate_fails_for_matches,
            config.reporting,
            exclude_columns=tuple(config.excluded_columns or ()),
        )

    # -- joins -------------------------------------------------------------
    def _theta_join(
        self,
        entities: Entities,
        config: AbstractJoin,
        how: str,
        *,
        source_extra: list[tuple[str, Column]] | None = None,
        target_extra: list[tuple[str, Column]] | None = None,
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        source = entities[config.entity_name]
        for name, col in source_extra or []:
            source = source.withColumn(name, col)
        source = source.alias(config.entity_name)
        target = entities[config.target_name]
        for name, col in target_extra or []:
            target = target.withColumn(name, col)
        target = target.alias(config.target_name)
        if getattr(config, "broadcast_target", False):
            target = F.broadcast(target)
        joined = source.join(target, on=F.expr(config.join_condition), how=how)
        return source, target, joined

    def _project_join_result(
        self,
        source: DataFrame,
        joined: DataFrame,
        config: AbstractNewColumnJoin,
        *,
        drop_source_columns: tuple[str, ...] = (),
    ) -> DataFrame:
        """All source columns + new_columns, last-wins case-insensitive."""
        exprs = [
            f"{config.entity_name}.`{c}`"
            for c in source.columns
            if c not in drop_source_columns
        ]
        exprs += parse_multiple_expressions(config.new_columns or [])
        wide = joined.selectExpr(*exprs)

        # Deduplicate case-insensitively, keeping the LAST occurrence and its
        # casing. Duplicate names can't be selected by name, so rename all
        # columns positionally first.
        names = wide.columns
        keep_index: dict[str, int] = {}
        casing: dict[str, str] = {}
        for i, name in enumerate(names):
            key = name.upper()
            keep_index[key] = i
            casing[key] = name
        if len(keep_index) == len(names):
            return wide
        positional = wide.toDF(*[f"_c{i}" for i in range(len(names))])
        return positional.select(
            *[
                F.col(f"_c{i}").alias(casing[key])
                for key, i in keep_index.items()
            ]
        )

    def _assert_join_not_multiplying(
        self, joined: DataFrame, rowid: str, config: AbstractJoin
    ) -> DataFrame:
        """Single-execution integrity check: persist the join, run ONE action
        computing (total, distinct source rows), raise if any source row
        matched more than once. The returned (persisted) frame must be used
        for the downstream projection so the join executes exactly once —
        the reference runs two ``count()`` actions AND re-executes the join
        at write time (dve spark/rules.py:217-227)."""
        if joined.isStreaming:
            raise ConfigurationError(
                "integrity-checked joins (one_to_one_join / has_match with "
                "perform_integrity_check) are batch-only: count-equality "
                "over an unbounded stream is undefined; use a plain "
                "left_join or a per-microbatch foreachBatch check"
            )
        joined = joined.persist(StorageLevel.MEMORY_AND_DISK)
        self._persisted.append(joined)
        total, distinct = joined.select(
            F.count(F.lit(1)), F.count_distinct(_qcol(rowid))
        ).first()
        if total != distinct:
            joined.unpersist()
            raise ConstraintError(
                f"Multiple matches for some records from {config.entity_name!r} "
                f"for condition {config.join_condition!r}",
                constraint=(
                    f"records in source entity ({config.entity_name!r}) must "
                    f"match at most a single record in the target "
                    f"({config.target_name!r})"
                ),
            )
        return joined

    def cleanup(self) -> None:
        """Unpersist every frame cached for integrity checks."""
        for df in self._persisted:
            try:
                df.unpersist()
            except Exception:
                pass
        self._persisted.clear()

    def _new_column_join(
        self, entities: Entities, config: AbstractNewColumnJoin, how: str,
        *, integrity_check: bool = False,
    ) -> Messages:
        rowid = f"__rowid_{uuid.uuid4().hex[:8]}"
        extra = (
            [(rowid, F.monotonically_increasing_id())] if integrity_check else None
        )
        source, _, joined = self._theta_join(
            entities, config, how, source_extra=extra
        )
        if integrity_check:
            joined = self._assert_join_not_multiplying(joined, rowid, config)
        entities[config.output_name] = self._project_join_result(
            source, joined, config,
            drop_source_columns=(rowid,) if integrity_check else (),
        )
        return None

    def left_join(self, entities: Entities, *, config: LeftJoin) -> Messages:
        return self._new_column_join(entities, config, "left")

    def inner_join(self, entities: Entities, *, config: InnerJoin) -> Messages:
        return self._new_column_join(entities, config, "inner")

    def one_to_one_join(
        self, entities: Entities, *, config: OneToOneJoin
    ) -> Messages:
        return self._new_column_join(
            entities, config, "left",
            integrity_check=config.perform_integrity_check,
        )

    def semi_join(self, entities: Entities, *, config: SemiJoin) -> Messages:
        _, _, joined = self._theta_join(entities, config, "left_semi")
        entities[config.output_name] = joined
        return None

    def anti_join(self, entities: Entities, *, config: AntiJoin) -> Messages:
        _, _, joined = self._theta_join(entities, config, "left_anti")
        entities[config.output_name] = joined
        return None

    def has_match(
        self, entities: Entities, *, config: ConfirmJoinHasMatch
    ) -> Messages:
        rowid = f"__rowid_{uuid.uuid4().hex[:8]}"
        check = config.perform_integrity_check
        extra = [(rowid, F.monotonically_increasing_id())] if check else None
        source, _, joined = self._theta_join(
            entities, config, "left", source_extra=extra
        )
        if check:
            joined = self._assert_join_not_multiplying(joined, rowid, config)
        out_cols = [
            f"{config.entity_name}.`{c}`" for c in source.columns if c != rowid
        ]
        out = joined.select(
            *[F.expr(e) for e in out_cols],
            F.coalesce(
                F.expr(config.join_condition).cast("boolean"), F.lit(False)
            ).alias(config.column_name),
        )
        entities[config.output_name] = out
        return None

    def join_header(self, entities: Entities, *, config: HeaderJoin) -> Messages:
        source = entities[config.entity_name]
        header = entities[config.target_name]
        # exactly-one-row check: fetch at most 2 rows, never a full count
        probe = header.take(2)
        if len(probe) != 1:
            raise ConstraintError(
                f"Unable to join header {config.target_name!r} to "
                f"{config.entity_name!r}: expected 1 record, got {len(probe)}",
                constraint=(
                    f"Header entity {config.target_name!r} must contain a "
                    f"single record"
                ),
            )
        # distributed: broadcast the 1-row struct, cross join (no driver
        # literal rebuild — cf. dve spark/rules.py:272-297)
        header_struct = header.select(
            F.struct(*[_qcol(c) for c in header.columns]).alias(
                config.header_column_name
            )
        )
        entities[config.output_name] = source.crossJoin(
            F.broadcast(header_struct)
        )
        return None

    def union(self, entities: Entities, *, config: TableUnion) -> Messages:
        source = entities[config.entity_name]
        target = entities[config.target_name]

        # source order + casing wins; target-only columns appended in target
        # order; missing sides null-filled (dve spark/rules.py:299-337)
        source_by_upper = {c.upper(): c for c in source.columns}
        target_by_upper = {c.upper(): c for c in target.columns}
        ordered_upper = [c.upper() for c in source.columns] + [
            c.upper() for c in target.columns if c.upper() not in source_by_upper
        ]

        source_sel: list[Column] = []
        target_sel: list[Column] = []
        for key in ordered_upper:
            s_name = source_by_upper.get(key)
            t_name = target_by_upper.get(key)
            out_name = s_name or t_name or key
            if s_name:
                source_sel.append(_qcol(s_name))
            else:
                source_sel.append(F.lit(None).alias(out_name))
            if t_name:
                target_sel.append(_qcol(t_name).alias(out_name))
            else:
                target_sel.append(F.lit(None).alias(out_name))

        entities[config.output_name] = source.select(*source_sel).union(
            target.select(*target_sel)
        )
        return None

    def identify_orphans(
        self, entities: Entities, *, config: OrphanIdentification
    ) -> Messages:
        """Boolean ``IsOrphaned`` flag: no match in target under the theta
        condition; OR-accumulated with a pre-existing flag.

        Scale plan: the left join can multiply each source row by its match
        count, so the joined frame is never shuffled wide. It is projected to
        the narrow ``(rowid, match)`` pair, aggregated to one flag per row,
        and the flags (2 columns) are joined back to the un-multiplied
        source. The wide data moves through exactly one join-key shuffle —
        vs the reference's uuid-keyed groupBy + join-back over all columns
        (dve spark/rules.py:339-374).

        ``rowid`` is a CONTENT hash — ``md5(to_json(struct(*columns)))`` —
        not ``monotonically_increasing_id``: the source subtree executes
        twice in this plan (once under the join, once as the join-back left
        side), and positional ids are only stable across executions for a
        deterministic scan. On derived entities (post-join/post-aggregate)
        intra-partition order can differ between executions, silently
        attaching flags to the wrong rows. A content hash is identical on
        both executions by construction; rows with byte-identical content
        are interchangeable under any join condition (the condition only
        reads columns), so collapsing them to one flag group is exact —
        each source row still joins exactly one flag row (no
        multiplication). Falls back to ``monotonically_increasing_id`` over
        an eagerly local-checkpointed source only if a column type is not
        ``to_json``-serialisable.
        """
        rowid = f"__rowid_{uuid.uuid4().hex[:8]}"
        match = f"__match_{uuid.uuid4().hex[:8]}"
        base = entities[config.entity_name]
        # microsecond timestamp formats: to_json's defaults truncate to
        # milliseconds, which would collapse rows differing only in sub-ms
        # timestamps into one rowid (and let a matching row mask a
        # non-matching near-twin); Spark timestamps are at most µs precision
        # so these render losslessly, including inside nested types
        content_id = F.md5(
            F.to_json(
                F.struct(*[_qcol(c) for c in base.columns]),
                {
                    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
                    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
                },
            )
        )
        try:
            # force analysis so unsupported column types surface here
            _ = base.select(content_id.alias(rowid)).schema
            rowid_col = content_id
        except Exception:
            rowid_col = F.monotonically_increasing_id()
            if not base.isStreaming:
                # one materialisation both plan branches read, so the
                # positional ids cannot disagree between executions (same
                # data/schema — safe to keep for later steps too)
                entities[config.entity_name] = base.localCheckpoint(
                    eager=True
                )
        source, _, joined = self._theta_join(
            entities,
            config,
            "left",
            source_extra=[(rowid, rowid_col)],
            target_extra=[(match, F.lit(1))],
        )
        src_name = config.entity_name
        source_cols = [c for c in source.columns if c != rowid]

        # narrow aggregation: (rowid, match) only — no wide shuffle of the
        # multiplied join output
        flags = (
            joined.select(
                F.col(f"{src_name}.`{rowid}`").alias(rowid), _qcol(match)
            )
            .groupBy(rowid)
            .agg((F.count(_qcol(match)) == F.lit(0)).alias("__orphaned_now"))
        )

        out = source.join(flags, on=rowid, how="inner")
        if "IsOrphaned" in source_cols:
            orphan_col = (_qcol("IsOrphaned") | F.col("__orphaned_now")).alias(
                "IsOrphaned"
            )
            ordered = source_cols
        else:
            orphan_col = F.col("__orphaned_now").alias("IsOrphaned")
            ordered = source_cols + ["IsOrphaned"]
        out = out.select(
            *[
                orphan_col if c == "IsOrphaned" else _qcol(c)
                for c in ordered
            ]
        )
        entities[config.output_name] = out
        return None

    # -- entity namespace --------------------------------------------------
    def copy_entity(self, entities: Entities, *, config: CopyEntity) -> Messages:
        entities[config.new_entity_name] = entities[config.entity_name]
        return None

    def rename_entity(
        self, entities: Entities, *, config: RenameEntity
    ) -> Messages:
        entities[config.new_entity_name] = entities[config.entity_name]
        del entities[config.entity_name]
        return None

    def remove_entities(
        self, entities: Entities, *, config: EntityRemoval
    ) -> Messages:
        for name in config.entity_names:
            del entities[name]
        return None

    # -- corpus (llmops) steps ---------------------------------------------
    # Thin dispatch over :mod:`llmops` so corpus cleaning is declarable in a
    # dischema ``transformations`` list like any validation step (imports
    # are local: llmops is an optional surface for pure-validation users).

    def dedup_exact(self, entities: Entities, *, config: ExactDedup) -> Messages:
        from data_validation_engine_spark.llmops.dedup import exact_dedup

        keys = (
            [config.key_columns]
            if isinstance(config.key_columns, str)
            else list(config.key_columns)
        )
        out = exact_dedup(
            entities[config.entity_name],
            keys,
            order_col=config.order_column,
            normalize_text=config.normalize_text,
        )
        if config.count_column is None:
            out = out.drop("n_copies")
        elif config.count_column != "n_copies":
            out = out.withColumnRenamed("n_copies", config.count_column)
        entities[config.output_name] = out
        return None

    def dedup_minhash(
        self, entities: Entities, *, config: MinHashDedup
    ) -> Messages:
        from data_validation_engine_spark.llmops.dedup import minhash_dedup

        kwargs: dict = {"threshold": config.threshold}
        if config.shingle_size is not None:
            kwargs["shingle_size"] = config.shingle_size
        if config.num_hashes is not None:
            kwargs["num_hashes"] = config.num_hashes
        if config.bands is not None:
            kwargs["bands"] = config.bands
        entities[config.output_name] = minhash_dedup(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            exact_components=config.exact_components,
            component_algorithm=config.component_algorithm,
            quality_col=config.quality_column,
            higher_is_better=config.higher_is_better,
            **kwargs,
        )
        return None

    def embedding_neardup(
        self, entities: Entities, *, config: EmbeddingNearDup
    ) -> Messages:
        if config.target_name is not None:
            from data_validation_engine_spark.llmops.similarity import (
                incremental_embedding_dedup,
            )

            entities[config.output_name] = incremental_embedding_dedup(
                entities[config.entity_name],
                entities[config.target_name],
                id_col=config.id_column,
                vec_col=config.vector_column,
                corpus_index=(
                    entities[config.index_entity]
                    if config.index_entity
                    else None
                ),
                n_planes=config.n_planes,
                n_tables=config.n_tables,
                dim=config.dim,
                threshold=config.threshold,
            )
            return None
        from data_validation_engine_spark.llmops.similarity import (
            embedding_neardup_pairs,
        )

        entities[config.output_name] = embedding_neardup_pairs(
            entities[config.entity_name],
            id_col=config.id_column,
            vec_col=config.vector_column,
            n_planes=config.n_planes,
            dim=config.dim,
            threshold=config.threshold,
        )
        return None

    def text_stats(self, entities: Entities, *, config: TextStats) -> Messages:
        from data_validation_engine_spark.llmops.text import text_stats

        entities[config.output_name] = text_stats(
            entities[config.entity_name], config.id_column, config.text_column
        )
        return None

    def text_repetition(
        self, entities: Entities, *, config: RepetitionStats
    ) -> Messages:
        from data_validation_engine_spark.llmops.text import repetition_stats

        entities[config.output_name] = repetition_stats(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            max_top_token_frac=config.max_top_token_frac,
            max_dup_bigram_frac=config.max_dup_bigram_frac,
        )
        return None

    def pii_scrub(self, entities: Entities, *, config: PiiScrub) -> Messages:
        from data_validation_engine_spark.llmops.text import pii_scrub

        entities[config.output_name] = pii_scrub(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            out_col=config.clean_column,
        )
        return None

    def decontaminate(
        self, entities: Entities, *, config: Decontaminate
    ) -> Messages:
        from data_validation_engine_spark.llmops.decontam import decontaminate

        entities[config.output_name] = decontaminate(
            entities[config.entity_name],
            entities[config.target_name],
            config.id_column,
            config.text_column,
            ngram=config.ngram,
        )
        return None

    def chunk_documents(
        self, entities: Entities, *, config: ChunkDocuments
    ) -> Messages:
        from data_validation_engine_spark.llmops.chunking import (
            chunk_documents,
        )

        entities[config.output_name] = chunk_documents(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            chunk_tokens=config.chunk_tokens,
            overlap=config.overlap,
        )
        return None

    def pack_sequences(
        self, entities: Entities, *, config: PackSequences
    ) -> Messages:
        from data_validation_engine_spark.llmops.chunking import (
            pack_sequences,
        )

        entities[config.output_name] = pack_sequences(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            capacity=config.capacity,
            n_shards=config.n_shards,
            seed=config.seed,
        )
        return None

    def label_centroids(
        self, entities: Entities, *, config: LabelCentroids
    ) -> Messages:
        from data_validation_engine_spark.llmops.vectors import (
            label_centroids,
        )

        entities[config.output_name] = label_centroids(
            entities[config.entity_name],
            config.label_column,
            config.id_column,
            config.vector_column,
            dim=config.dim,
            segment_size=config.segment_size,
        )
        return None

    def nearest_centroid(
        self, entities: Entities, *, config: NearestCentroid
    ) -> Messages:
        from data_validation_engine_spark.llmops.vectors import (
            nearest_centroid,
        )

        entities[config.output_name] = nearest_centroid(
            entities[config.entity_name],
            entities[config.target_name],
            id_col=config.id_column,
            vec_col=config.vector_column,
            label_col=config.label_column,
            centroid_col=config.centroid_column,
        )
        return None

    def kmeans(self, entities: Entities, *, config: KMeansFit) -> Messages:
        from data_validation_engine_spark.llmops.ivf import ivf_assign
        from data_validation_engine_spark.llmops.vectors import kmeans_fit

        df = entities[config.entity_name]
        cents = kmeans_fit(
            df,
            config.k,
            id_col=config.id_column,
            vec_col=config.vector_column,
            dim=config.dim,
            n_iters=config.n_iters,
            segment_size=config.segment_size,
        )
        counts = (
            ivf_assign(
                df.select(config.id_column, config.vector_column),
                cents,
                vec_col=config.vector_column,
            )
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        cent_rows = self.spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "cell int, centroid array<double>",
        )
        entities[config.output_name] = (
            cent_rows.join(counts, on="cell", how="left")
            .select(
                "cell",
                F.coalesce(F.col("n"), F.lit(0)).alias("n"),
                "centroid",
            )
        )
        return None

    def knn_join(self, entities: Entities, *, config: KnnJoin) -> Messages:
        from data_validation_engine_spark.llmops.similarity import knn_join

        entities[config.output_name] = knn_join(
            entities[config.entity_name],
            config.k,
            id_col=config.id_column,
            vec_col=config.vector_column,
            n_planes=config.n_planes,
            n_tables=config.n_tables,
            dim=config.dim,
        )
        return None

    def build_vocab(
        self, entities: Entities, *, config: BuildVocab
    ) -> Messages:
        from data_validation_engine_spark.llmops.text import build_vocab

        entities[config.output_name] = build_vocab(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            min_count=config.min_count,
            min_doc_freq=config.min_doc_freq,
        )
        return None

    def lang_id(self, entities: Entities, *, config: LanguageId) -> Messages:
        from data_validation_engine_spark.llmops.text import language_id

        entities[config.output_name] = language_id(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            out_col=config.lang_column,
        )
        return None

    def tfidf_top_terms(
        self, entities: Entities, *, config: TfIdfTopTerms
    ) -> Messages:
        from data_validation_engine_spark.llmops.text import tfidf_top_terms

        entities[config.output_name] = tfidf_top_terms(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            top_n=config.top_n,
        )
        return None

    def text_fingerprint(
        self, entities: Entities, *, config: TextFingerprint
    ) -> Messages:
        from data_validation_engine_spark.llmops.text import text_fingerprint

        entities[config.output_name] = text_fingerprint(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            shingle_size=config.shingle_size,
            winnow_k=config.winnow_k,
        )
        return None

    def dedup_simhash(
        self, entities: Entities, *, config: SimHashSignatures
    ) -> Messages:
        from data_validation_engine_spark.llmops.dedup import simhash_table

        entities[config.output_name] = simhash_table(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            bits=config.bits,
        )
        return None

    def dedup_simhash_pairs(
        self, entities: Entities, *, config: SimHashPairs
    ) -> Messages:
        from data_validation_engine_spark.llmops.dedup import simhash_pairs

        entities[config.output_name] = simhash_pairs(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            bits=config.bits,
            max_hamming=config.max_hamming,
        )
        return None

    def hash_split(self, entities: Entities, *, config: HashSplit) -> Messages:
        from data_validation_engine_spark.llmops.split import hash_split

        entities[config.output_name] = hash_split(
            entities[config.entity_name],
            config.key_column,
            splits=dict(config.splits),
            seed=config.seed,
            split_col=config.split_column,
        )
        return None

    def asof_join(self, entities: Entities, *, config: AsofJoin) -> Messages:
        from data_validation_engine_spark.llmops.asof import asof_join

        entities[config.output_name] = asof_join(
            entities[config.entity_name],
            entities[config.target_name],
            list(config.on),
            left_ts=config.left_ts,
            right_ts=config.right_ts,
            value_cols=(
                list(config.value_columns)
                if config.value_columns is not None
                else None
            ),
            prefix=config.prefix,
            direction=config.direction,
            tolerance=config.tolerance,
        )
        return None

    def stratified_sample(
        self, entities: Entities, *, config: StratifiedSample
    ) -> Messages:
        from data_validation_engine_spark.llmops.split import (
            stratified_sample,
        )

        entities[config.output_name] = stratified_sample(
            entities[config.entity_name],
            config.key_column,
            config.strata_column,
            dict(config.fractions),
            default_fraction=config.default_fraction,
            seed=config.seed,
        )
        return None

    def hash_sample(
        self, entities: Entities, *, config: HashSample
    ) -> Messages:
        from data_validation_engine_spark.llmops.split import (
            deterministic_sample,
        )

        entities[config.output_name] = deterministic_sample(
            entities[config.entity_name],
            config.key_column,
            config.fraction,
            seed=config.seed,
        )
        return None

    def dedup_ngram_pairs(
        self, entities: Entities, *, config: NgramJaccardPairs
    ) -> Messages:
        from data_validation_engine_spark.llmops.dedup import (
            ngram_jaccard_pairs,
        )

        entities[config.output_name] = ngram_jaccard_pairs(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            shingle_size=config.shingle_size,
            threshold=config.threshold,
        )
        return None

    def connected_components(
        self, entities: Entities, *, config: ConnectedComponents
    ) -> Messages:
        from data_validation_engine_spark.llmops.dedup import (
            connected_components,
            connected_components_star,
        )

        cc = (
            connected_components_star
            if config.algorithm == "star"
            else connected_components
        )
        entities[config.output_name] = cc(entities[config.entity_name])
        return None

    def sessionize(self, entities: Entities, *, config: Sessionize) -> Messages:
        from data_validation_engine_spark.streaming.sessions import (
            session_stats,
            sessionize,
        )

        fn = session_stats if config.output == "sessions" else sessionize
        entities[config.output_name] = fn(
            entities[config.entity_name],
            config.user_column,
            config.ts_column,
            gap_seconds=config.gap_seconds,
        )
        return None

    def quality_filters(
        self, entities: Entities, *, config: QualityFilters
    ) -> Messages:
        from data_validation_engine_spark.llmops.text import quality_filters
        from data_validation_engine_spark.steps.sync_filters import (
            apply_sync_filters,
        )

        target = config.output_name
        if target != config.entity_name:
            entities[target] = entities[config.entity_name]
        gates = quality_filters(
            target,
            config.text_column,
            min_tokens=config.min_tokens,
            max_tokens=config.max_tokens,
            max_punct_ratio=config.max_punct_ratio,
            min_avg_token_len=config.min_avg_token_len,
            max_avg_token_len=config.max_avg_token_len,
        )
        return apply_sync_filters(entities, gates)

    def similarity_topk(
        self, entities: Entities, *, config: SimilarityTopK
    ) -> Messages:
        from data_validation_engine_spark.llmops.ivf import ivf_topk
        from data_validation_engine_spark.llmops.similarity import (
            ann_topk,
            cosine_topk,
            multiprobe_ann_topk,
        )

        table = entities[config.entity_name]
        query = entities[config.target_name]
        if config.method == "pq":
            from data_validation_engine_spark.llmops.pq import pq_topk

            books = self._resolve_pq_codebooks(entities, config, table)
            out = pq_topk(
                table,
                query,
                config.k,
                codebooks=books,
                id_col=config.id_column,
                vec_col=config.vector_column,
                codes_col=config.codes_column,
                exclude_self=config.exclude_self,
                refine_factor=config.pq_refine,
            )
        elif config.method == "ivf":
            out = ivf_topk(
                table,
                query,
                config.k,
                id_col=config.id_column,
                vec_col=config.vector_column,
                centroids=(
                    [list(c) for c in config.centroids]
                    if config.centroids
                    else None
                ),
                n_cells=config.n_cells,
                n_probe=config.n_probe,
                exclude_self=config.exclude_self,
            )
        elif config.method == "multiprobe":
            out = multiprobe_ann_topk(
                table,
                query,
                config.k,
                id_col=config.id_column,
                vec_col=config.vector_column,
                n_planes=config.n_planes,
                n_tables=config.n_tables,
                dim=config.dim,
                exclude_self=config.exclude_self,
            )
        elif config.method == "ann":
            out = ann_topk(
                table,
                query,
                config.k,
                id_col=config.id_column,
                vec_col=config.vector_column,
                n_planes=config.n_planes,
                dim=config.dim,
                exclude_self=config.exclude_self,
            )
        else:
            out = cosine_topk(
                table,
                query,
                config.k,
                id_col=config.id_column,
                vec_col=config.vector_column,
                exclude_self=config.exclude_self,
            )
        entities[config.output_name] = out
        return None

    # -- interval / windowed analytics (round 6) ---------------------------
    def interval_join(
        self, entities: Entities, *, config: IntervalJoin
    ) -> Messages:
        from data_validation_engine_spark.llmops.interval import interval_join

        entities[config.output_name] = interval_join(
            entities[config.entity_name],
            entities[config.target_name],
            left_start=config.left_start,
            left_end=config.left_end,
            right_start=config.right_start,
            right_end=config.right_end,
            on=list(config.on) or None,
            bucket_width=config.bucket_width,
            prefix=config.prefix,
        )
        return None

    def top_k(self, entities: Entities, *, config: TopKPerGroup) -> Messages:
        from data_validation_engine_spark.llmops.analytics import grouped_topk

        entities[config.output_name] = grouped_topk(
            entities[config.entity_name],
            list(config.group_by),
            config.order_column,
            config.k,
            descending=config.descending,
            tiebreak_cols=list(config.tiebreak_columns) or None,
            rank_col=config.rank_column,
        )
        return None

    def rolling_agg(
        self, entities: Entities, *, config: RollingAggregate
    ) -> Messages:
        from data_validation_engine_spark.llmops.analytics import rolling_agg

        entities[config.output_name] = rolling_agg(
            entities[config.entity_name],
            partition_cols=list(config.partition_by),
            ts_col=config.ts_column,
            window_seconds=config.window_seconds,
            aggs={name: F.expr(expr) for name, expr in config.aggregations},
            include_current=config.include_current,
        )
        return None

    def dedup_incremental(
        self, entities: Entities, *, config: IncrementalDedup
    ) -> Messages:
        from data_validation_engine_spark.llmops.dedup import (
            incremental_exact_dedup,
            incremental_ngram_dedup,
        )

        new_df = entities[config.entity_name]
        corpus = entities[config.target_name]
        if config.method == "minhash":
            from data_validation_engine_spark.llmops.dedup import (
                incremental_minhash_dedup,
            )

            out = incremental_minhash_dedup(
                new_df,
                corpus,
                config.id_column,
                config.text_column,
                corpus_index=(
                    entities[config.index_entity]
                    if config.index_entity
                    else None
                ),
                threshold=config.threshold,
                shingle_size=config.shingle_size,
                num_hashes=config.num_hashes,
                bands=config.bands,
            )
            entities[config.output_name] = out
            return None
        if config.method == "ngram":
            out = incremental_ngram_dedup(
                new_df,
                corpus,
                config.id_column,
                config.text_column,
                threshold=config.threshold,
                shingle_size=config.shingle_size,
            )
        else:
            out = incremental_exact_dedup(
                new_df,
                corpus,
                config.text_column,
                order_col=config.id_column,
                normalize_text=config.normalize_text,
            )
        entities[config.output_name] = out
        return None

    def dedup_containment_pairs(
        self, entities: Entities, *, config: ContainmentPairs
    ) -> Messages:
        from data_validation_engine_spark.llmops.dedup import (
            containment_pairs,
        )

        entities[config.output_name] = containment_pairs(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            threshold=config.threshold,
            shingle_size=config.shingle_size,
        )
        return None

    def weighted_sample(
        self, entities: Entities, *, config: WeightedSample
    ) -> Messages:
        from data_validation_engine_spark.llmops.split import weighted_sample

        entities[config.output_name] = weighted_sample(
            entities[config.entity_name],
            config.key_column,
            config.weight_column,
            rate=config.rate,
            seed=config.seed,
        )
        return None

    def approx_distinct(
        self, entities: Entities, *, config: ApproxDistinct
    ) -> Messages:
        from data_validation_engine_spark.llmops.sketch import kmv_distinct

        entities[config.output_name] = kmv_distinct(
            entities[config.entity_name],
            list(config.group_by),
            config.value_column,
            k=config.k,
            seed=config.seed,
        )
        return None

    def grouped_quantiles(
        self, entities: Entities, *, config: GroupedQuantiles
    ) -> Messages:
        from data_validation_engine_spark.llmops.analytics import (
            grouped_quantiles,
        )

        entities[config.output_name] = grouped_quantiles(
            entities[config.entity_name],
            list(config.group_by),
            config.value_column,
            list(config.probs),
            round_to=config.round_to,
        )
        return None

    def profile(
        self, entities: Entities, *, config: ProfileColumns
    ) -> Messages:
        from data_validation_engine_spark.llmops.analytics import (
            profile_columns,
        )

        entities[config.output_name] = profile_columns(
            entities[config.entity_name],
            list(config.columns) if config.columns is not None else None,
        )
        return None

    def fuzzy_join(self, entities: Entities, *, config: FuzzyJoin) -> Messages:
        from data_validation_engine_spark.llmops.linkage import (
            fuzzy_string_join,
        )

        entities[config.output_name] = fuzzy_string_join(
            entities[config.entity_name],
            entities[config.right_entity],
            config.left_column,
            config.right_column,
            max_distance=config.max_distance,
            prefix_len=config.prefix_len,
            length_bucket=config.length_bucket,
            prefix=config.prefix,
        )
        return None

    def bm25(self, entities: Entities, *, config: Bm25Search) -> Messages:
        from data_validation_engine_spark.llmops.text import bm25_search

        entities[config.output_name] = bm25_search(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            config.query,
            k1=config.k1,
            b=config.b,
            round_to=config.round_to,
            detail=config.detail,
        )
        return None

    def pagerank(
        self, entities: Entities, *, config: PageRankStep
    ) -> Messages:
        from data_validation_engine_spark.llmops.graph import pagerank

        entities[config.output_name] = pagerank(
            entities[config.entity_name],
            src_col=config.src_column,
            dst_col=config.dst_column,
            weight_col=config.weight_column,
            iterations=config.iterations,
            damping=config.damping,
        )
        return None

    def encode_tokens(
        self, entities: Entities, *, config: EncodeTokens
    ) -> Messages:
        from data_validation_engine_spark.llmops.text import encode_tokens

        entities[config.output_name] = encode_tokens(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            entities[config.vocab_entity],
            unk_id=config.unk_id,
        )
        return None

    def profile_gate(
        self, entities: Entities, *, config: ProfileGate
    ) -> Messages:
        """Dataset-level thresholds over the single-pass column profile,
        reported as SUBMISSION-severity messages (the reference's
        failure_type taxonomy, messages.py:36) — entirely lazy: the
        profile aggregate and the threshold filters are one plan, no
        driver-side inspection of the stats."""
        from data_validation_engine_spark.llmops.analytics import (
            profile_columns,
        )
        from data_validation_engine_spark.messages import RECORD_INDEX

        df = entities[config.entity_name]
        prof = profile_columns(
            df,
            list(config.columns) if config.columns is not None else None,
        )

        def msg(
            filtered: DataFrame,
            template: Column,
            value: Column,
            *,
            field: Column | None = None,
        ):
            # entity-level violations (min_rows) carry a NULL
            # reporting_field — blaming an arbitrary column would
            # misattribute a dataset-wide failure
            field = F.col("column") if field is None else field
            return filtered.select(
                F.lit(config.entity_name).alias("entity"),
                F.lit(config.entity_name).alias("original_entity"),
                F.lit(None).cast("long").alias(RECORD_INDEX),
                F.lit(config.code).alias("error_code"),
                template.alias("error_message"),
                F.lit(None).cast("string").alias("error_location"),
                F.lit("submission").alias("failure_type"),
                F.lit(False).alias("is_informational"),
                F.lit("profile").alias("category"),
                field.alias("reporting_field"),
                value.cast("string").alias("value"),
                F.lit(None).cast("string").alias("record_json"),
            )

        feeds = []
        if config.max_null_frac is not None:
            frac = F.col("n_null") / F.greatest(F.col("n_rows"), F.lit(1))
            feeds.append(
                msg(
                    prof.where(frac > F.lit(float(config.max_null_frac))),
                    F.concat(
                        F.lit("column "), F.col("column"),
                        F.lit(" null fraction "),
                        F.round(frac, 4).cast("string"),
                        F.lit(f" exceeds {float(config.max_null_frac)!r}"),
                    ),
                    frac,
                )
            )
        if config.min_distinct is not None:
            feeds.append(
                msg(
                    prof.where(
                        F.col("n_distinct") < F.lit(int(config.min_distinct))
                    ),
                    F.concat(
                        F.lit("column "), F.col("column"),
                        F.lit(" has "), F.col("n_distinct").cast("string"),
                        F.lit(f" distinct values, below {int(config.min_distinct)}"),
                    ),
                    F.col("n_distinct"),
                )
            )
        if config.min_rows is not None:
            feeds.append(
                msg(
                    prof.limit(1).where(
                        F.col("n_rows") < F.lit(int(config.min_rows))
                    ),
                    F.concat(
                        F.lit("entity has "),
                        F.col("n_rows").cast("string"),
                        F.lit(f" rows, below {int(config.min_rows)}"),
                    ),
                    F.col("n_rows"),
                    field=F.lit(None).cast("string"),
                )
            )
        from data_validation_engine_spark.messages import union_messages

        return union_messages(feeds)

    def frequent_items(
        self, entities: Entities, *, config: FrequentItems
    ) -> Messages:
        from data_validation_engine_spark.llmops.analytics import (
            frequent_items,
        )

        entities[config.output_name] = frequent_items(
            entities[config.entity_name],
            list(config.group_by),
            config.value_column,
            config.k,
            min_count=config.min_count,
        )
        return None

    def profile_diff(
        self, entities: Entities, *, config: ProfileDiff
    ) -> Messages:
        from data_validation_engine_spark.llmops.analytics import (
            profile_diff,
        )

        entities[config.output_name] = profile_diff(
            entities[config.entity_name],
            entities[config.target_name],
            # 'is not None': an explicitly-declared empty scope means
            # 'diff zero columns', not 'diff everything'
            columns=list(config.columns)
            if config.columns is not None
            else None,
        )
        return None

    def quantile_buckets(
        self, entities: Entities, *, config: QuantileBuckets
    ) -> Messages:
        from data_validation_engine_spark.llmops.analytics import (
            quantile_buckets,
        )

        entities[config.output_name] = quantile_buckets(
            entities[config.entity_name],
            list(config.group_by),
            config.value_column,
            config.n_buckets,
            bucket_col=config.bucket_column,
        )
        return None

    def outlier_flags(
        self, entities: Entities, *, config: OutlierFlags
    ) -> Messages:
        from data_validation_engine_spark.llmops.analytics import (
            outlier_flags,
        )

        entities[config.output_name] = outlier_flags(
            entities[config.entity_name],
            list(config.group_by),
            config.value_column,
            factor=config.factor,
            flag_col=config.flag_column,
        )
        return None

    def merge_upsert(
        self, entities: Entities, *, config: MergeUpsert
    ) -> Messages:
        from data_validation_engine_spark.merge import merge_upsert

        entities[config.output_name] = merge_upsert(
            entities[config.entity_name],
            entities[config.target_name],
            list(config.keys),
            update_cols=list(config.update_columns)
            if config.update_columns is not None
            else None,
            sequence_col=config.sequence_column,
            insert_missing=config.insert_missing,
        )
        return None

    def apply_changes(
        self, entities: Entities, *, config: ApplyChanges
    ) -> Messages:
        from data_validation_engine_spark.merge import apply_changes

        entities[config.output_name] = apply_changes(
            entities[config.entity_name],
            entities[config.target_name],
            list(config.keys),
            op_col=config.op_column,
            sequence_col=config.sequence_column,
        )
        return None

    def triangle_count(
        self, entities: Entities, *, config: TriangleCount
    ) -> Messages:
        from data_validation_engine_spark.llmops.graph import triangle_count

        entities[config.output_name] = triangle_count(
            entities[config.entity_name],
            src_col=config.src_column,
            dst_col=config.dst_column,
        )
        return None

    def paragraph_dedup(
        self, entities: Entities, *, config: ParagraphDedup
    ) -> Messages:
        from data_validation_engine_spark.llmops.paragraphs import (
            remove_repeated_paragraphs,
        )

        entities[config.output_name] = remove_repeated_paragraphs(
            entities[config.entity_name],
            config.key_column,
            config.text_column,
            sep=config.separator,
            min_chars=config.min_chars,
            normalize=config.normalize,
            max_docs=config.max_docs,
            keep=config.keep,
            out_col=config.output_column,
        )
        return None

    def semantic_dedup(
        self, entities: Entities, *, config: SemanticDedup
    ) -> Messages:
        from data_validation_engine_spark.llmops import semdedup

        fn = {
            "kept": semdedup.semantic_dedup,
            "groups": semdedup.semantic_dup_groups,
            "pairs": semdedup.semantic_pairs,
        }[config.output]
        entities[config.output_name] = fn(
            entities[config.entity_name],
            id_col=config.key_column,
            vec_col=config.vector_column,
            dim=config.dim,
            n_cells=config.n_cells,
            threshold=config.threshold,
            n_iters=config.n_iters,
        )
        return None

    def grouped_auc(
        self, entities: Entities, *, config: GroupedAuc
    ) -> Messages:
        from data_validation_engine_spark.llmops.stats import grouped_auc

        entities[config.output_name] = grouped_auc(
            entities[config.entity_name],
            config.score_column,
            config.label_column,
            group_cols=list(config.group_by),
        )
        return None

    def shared_spans(
        self, entities: Entities, *, config: SharedSpans
    ) -> Messages:
        from data_validation_engine_spark.llmops.spans import (
            shared_span_pairs,
            shared_spans_incremental,
            winnowed_fingerprints,
        )

        if config.mode == "fingerprints":
            if config.index_name is not None:
                raise ConfigurationError(
                    "shared_spans: mode='fingerprints' builds an index "
                    "— index_name applies only to mode='pairs' probes"
                )
            entities[config.output_name] = winnowed_fingerprints(
                entities[config.entity_name],
                config.key_column,
                config.text_column,
                width=config.width,
                window=config.window,
                normalize=config.normalize,
            )
            return None
        if config.index_name is not None:
            entities[config.output_name] = shared_spans_incremental(
                entities[config.entity_name],
                entities[config.index_name],
                config.key_column,
                config.text_column,
                width=config.width,
                window=config.window,
                min_shared=config.min_shared,
                normalize=config.normalize,
                broadcast_new=config.broadcast_new,
            )
            return None
        entities[config.output_name] = shared_span_pairs(
            entities[config.entity_name],
            config.key_column,
            config.text_column,
            width=config.width,
            window=config.window,
            min_shared=config.min_shared,
            normalize=config.normalize,
        )
        return None

    def lm_perplexity(
        self, entities: Entities, *, config: LmPerplexity
    ) -> Messages:
        from data_validation_engine_spark.llmops.lm import (
            perplexity_score,
            train_char_lm,
        )

        model, total, vocab = train_char_lm(
            entities[config.reference_name], config.text_column, n=config.n
        )
        df = entities[config.entity_name]
        scores = perplexity_score(
            df, model, total, vocab,
            config.key_column, config.text_column,
            n=config.n, alpha=config.alpha,
        )
        entities[config.output_name] = df.join(
            scores, config.key_column, "left"
        )
        return None

    def word_lm(
        self, entities: Entities, *, config: WordLm
    ) -> Messages:
        from data_validation_engine_spark.llmops.lm import (
            stupid_backoff_score,
            train_word_lm,
            word_lm_from_rows,
            word_lm_to_rows,
        )

        if (config.reference_name is None) == (config.model_name is None):
            raise ConfigurationError(
                "word_lm: pass exactly one of reference_name / model_name"
            )
        if config.model_name is not None:
            model, total = word_lm_from_rows(entities[config.model_name])
        else:
            model, total = train_word_lm(
                entities[config.reference_name],
                config.text_column,
                n=config.n,
                min_count=config.min_count,
            )
        if config.model_entity:
            entities[config.model_entity] = word_lm_to_rows(model, total)
        df = entities[config.entity_name]
        scores = stupid_backoff_score(
            df,
            model,
            total,
            config.key_column,
            config.text_column,
            n=config.n,
            alpha=config.alpha,
            broadcast_model=config.broadcast_model,
        )
        entities[config.output_name] = df.join(
            scores.drop(config.text_column)
            if config.text_column in scores.columns
            else scores,
            config.key_column,
            "left",
        )
        return None

    def hll_profile(
        self, entities: Entities, *, config: HllProfile
    ) -> Messages:
        from data_validation_engine_spark.llmops.sketch import (
            hll_profile,
            hll_rollup,
        )

        df = entities[config.entity_name]
        if config.mode == "rollup":
            entities[config.output_name] = hll_rollup(
                df, list(config.group_by), sketch_col=config.value_column
            )
        else:
            entities[config.output_name] = hll_profile(
                df,
                list(config.group_by),
                config.value_column,
                lg_k=config.lg_k,
                keep_sketch=config.keep_sketch,
            )
        return None

    def pca_project(
        self, entities: Entities, *, config: PcaProject
    ) -> Messages:
        from data_validation_engine_spark.llmops.pca import (
            pca_fit,
            pca_project,
        )

        df = entities[config.entity_name]
        mean, comps, expl = pca_fit(
            df, config.k,
            id_col=config.key_column,
            vec_col=config.vector_column,
            dim=config.dim,
        )
        entities[config.output_name] = pca_project(
            df, mean, comps,
            vec_col=config.vector_column,
            out_col=config.output_column,
        )
        if config.components_entity:
            entities[config.components_entity] = self.spark.createDataFrame(
                [
                    (i, expl[i], comps[i])
                    for i in range(len(comps))
                ],
                "component int, explained_variance double, weights array<double>",
            )
        return None

    def sampled_quantiles(
        self, entities: Entities, *, config: SampledQuantiles
    ) -> Messages:
        from data_validation_engine_spark.llmops.analytics import (
            sampled_quantiles,
        )

        entities[config.output_name] = sampled_quantiles(
            entities[config.entity_name],
            list(config.group_by),
            config.value_column,
            config.key_column,
            list(config.probs),
            k=config.k,
            round_to=config.round_to,
            seed=config.seed,
        )
        return None

    def salted_join(
        self, entities: Entities, *, config: SaltedJoin
    ) -> Messages:
        from data_validation_engine_spark.scale import salted_left_join

        entities[config.output_name] = salted_left_join(
            entities[config.entity_name],
            entities[config.target_name],
            config.key,
            n_salts=config.n_salts,
            how=config.how,
        )
        return None

    def quantize_vectors(
        self, entities: Entities, *, config: QuantizeVectors
    ) -> Messages:
        from data_validation_engine_spark.llmops.vectors import (
            quantize_vectors,
        )

        entities[config.output_name] = quantize_vectors(
            entities[config.entity_name],
            config.id_column,
            config.vector_column,
            round_to=config.round_to,
        )
        return None

    def snapshot_diff(
        self, entities: Entities, *, config: SnapshotDiff
    ) -> Messages:
        from data_validation_engine_spark.merge import snapshot_diff

        entities[config.output_name] = snapshot_diff(
            entities[config.entity_name],
            entities[config.target_name],
            list(config.keys),
            op_col=config.op_column,
            compare_cols=list(config.compare_columns)
            if config.compare_columns is not None
            else None,
        )
        return None

    def corpus_mix(
        self, entities: Entities, *, config: CorpusMix
    ) -> Messages:
        from data_validation_engine_spark.llmops.split import corpus_mix

        entities[config.output_name] = corpus_mix(
            entities[config.entity_name],
            config.key_column,
            config.label_column,
            config.weight_column,
            dict(config.targets) if config.targets is not None else None,
            config.budget,
            temperature=config.temperature,
            seed=config.seed,
        )
        return None

    def scd2(self, entities: Entities, *, config: Scd2Build) -> Messages:
        from data_validation_engine_spark.merge import scd2_from_ledger

        entities[config.output_name] = scd2_from_ledger(
            entities[config.entity_name],
            list(config.keys),
            sequence_col=config.sequence_column,
            op_col=config.op_column,
        )
        return None

    def exact_quota_sample(
        self, entities: Entities, *, config: ExactQuotaSample
    ) -> Messages:
        from data_validation_engine_spark.llmops.split import (
            exact_quota_sample,
        )

        entities[config.output_name] = exact_quota_sample(
            entities[config.entity_name],
            config.key_column,
            config.n,
            strata_cols=list(config.strata_columns)
            if config.strata_columns
            else None,
            seed=config.seed,
        )
        return None

    def winsorize(
        self, entities: Entities, *, config: Winsorize
    ) -> Messages:
        from data_validation_engine_spark.llmops.analytics import winsorize

        entities[config.output_name] = winsorize(
            entities[config.entity_name],
            list(config.group_by) if config.group_by else [],
            config.value_column,
            lower=config.lower,
            upper=config.upper,
            out_col=config.output_column,
            round_to=config.round_to,
        )
        return None

    def impute(self, entities: Entities, *, config: Impute) -> Messages:
        from data_validation_engine_spark.llmops.analytics import (
            impute_nulls,
        )

        entities[config.output_name] = impute_nulls(
            entities[config.entity_name],
            dict(config.columns),
            group_cols=list(config.group_by) if config.group_by else None,
            round_to=config.round_to,
        )
        return None

    def kmv_set(
        self, entities: Entities, *, config: KmvSetOps
    ) -> Messages:
        from data_validation_engine_spark.llmops.sketch import (
            kmv_set_estimates,
            kmv_sketch,
        )

        groups = list(config.group_by)
        sk_a = kmv_sketch(
            entities[config.entity_name],
            groups,
            config.value_column,
            k=config.k,
            seed=config.seed,
        )
        sk_b = kmv_sketch(
            entities[config.target_name],
            groups,
            config.target_value_column or config.value_column,
            k=config.k,
            seed=config.seed,
        )
        entities[config.output_name] = kmv_set_estimates(
            sk_a, sk_b, groups, k=config.k
        )
        return None

    def retention_cohorts(
        self, entities: Entities, *, config: RetentionCohorts
    ) -> Messages:
        from data_validation_engine_spark.llmops.events import (
            retention_cohorts,
        )

        entities[config.output_name] = retention_cohorts(
            entities[config.entity_name],
            config.user_column,
            config.ts_us_column,
            period_us=config.period_us,
        )
        return None

    def window_funnel(
        self, entities: Entities, *, config: WindowFunnel
    ) -> Messages:
        from data_validation_engine_spark.llmops.events import (
            funnel_counts,
            window_funnel,
        )

        per_user = window_funnel(
            entities[config.entity_name],
            config.user_column,
            config.ts_us_column,
            config.event_column,
            list(config.steps),
            window_us=config.window_us,
        )
        entities[config.output_name] = (
            funnel_counts(per_user, n_steps=len(config.steps))
            if config.counts
            else per_user
        )
        return None

    def chi2_drift(
        self, entities: Entities, *, config: Chi2Drift
    ) -> Messages:
        from data_validation_engine_spark.llmops.stats import chi2_drift

        entities[config.output_name] = chi2_drift(
            entities[config.entity_name],
            entities[config.target_name],
            config.column,
            round_to=config.round_to,
        )
        return None

    def grouped_regression(
        self, entities: Entities, *, config: GroupedRegression
    ) -> Messages:
        from data_validation_engine_spark.llmops.stats import (
            grouped_regression,
        )

        entities[config.output_name] = grouped_regression(
            entities[config.entity_name],
            list(config.group_by),
            config.x_column,
            config.y_column,
            scale=config.scale,
            round_to=config.round_to,
        )
        return None

    def pseudonymize(
        self, entities: Entities, *, config: Pseudonymize
    ) -> Messages:
        df = entities[config.entity_name]
        n = int(config.token_length)
        for c in config.columns:
            token = F.substring(
                F.sha2(
                    F.concat(F.lit(config.salt), F.col(c).cast("string")),
                    256,
                ),
                1,
                n,
            )
            df = df.withColumn(
                c, F.when(F.col(c).isNotNull(), token)
            )
        entities[config.output_name] = df
        return None

    def cluster_representatives(
        self, entities: Entities, *, config: ClusterRepresentatives
    ) -> Messages:
        from data_validation_engine_spark.llmops.dedup import (
            cluster_representatives,
        )

        entities[config.output_name] = cluster_representatives(
            entities[config.entity_name],
            config.cluster_column,
            score_col=config.score_column,
            id_col=config.id_column,
        )
        return None

    def render_chat(
        self, entities: Entities, *, config: RenderChat
    ) -> Messages:
        from data_validation_engine_spark.llmops.chat import render_chat

        entities[config.output_name] = render_chat(
            entities[config.entity_name],
            config.key_column,
            config.conversation_column,
            role_open=config.role_open,
            role_close=config.role_close,
            turn_end=config.turn_end,
            mask_roles=tuple(config.mask_roles),
        )
        return None

    def conversation_stats(
        self, entities: Entities, *, config: ConversationStats
    ) -> Messages:
        from data_validation_engine_spark.llmops.chat import (
            conversation_stats,
        )

        entities[config.output_name] = conversation_stats(
            entities[config.entity_name],
            config.key_column,
            config.conversation_column,
            user_role=config.user_role,
            assistant_role=config.assistant_role,
            system_role=config.system_role,
        )
        return None

    def normalize_text(
        self, entities: Entities, *, config: NormalizeText
    ) -> Messages:
        from data_validation_engine_spark.llmops.normalize import (
            normalize_text,
        )

        entities[config.output_name] = normalize_text(
            entities[config.entity_name],
            config.text_column,
            form=config.form,
            lowercase=config.lowercase,
            strip_control=config.strip_control,
            collapse_whitespace=config.collapse_whitespace,
            output_col=config.output_column,
        )
        return None

    def split_sentences(
        self, entities: Entities, *, config: SplitSentences
    ) -> Messages:
        from data_validation_engine_spark.llmops.paragraphs import (
            split_sentences,
        )

        entities[config.output_name] = split_sentences(
            entities[config.entity_name],
            config.key_column,
            config.text_column,
            min_chars=config.min_chars,
        )
        return None

    def standardize(
        self, entities: Entities, *, config: Standardize
    ) -> Messages:
        from data_validation_engine_spark.llmops.stats import standardize

        entities[config.output_name] = standardize(
            entities[config.entity_name],
            config.value_column,
            group_cols=list(config.group_by),
            method=config.method,
            out_col=config.output_column,
            ddof=config.ddof,
            broadcast_stats=config.broadcast_stats,
        )
        return None

    def select_token_budget(
        self, entities: Entities, *, config: SelectTokenBudget
    ) -> Messages:
        from data_validation_engine_spark.llmops.split import (
            select_token_budget,
        )

        entities[config.output_name] = select_token_budget(
            entities[config.entity_name],
            config.score_column,
            config.token_column,
            group_cols=list(config.group_by),
            budget_tokens=config.budget_tokens,
            budget_frac=config.budget_frac,
            tiebreak_col=config.tiebreak_column,
            keep_col=config.keep_column,
        )
        return None

    def chunk_by_sentences(
        self, entities: Entities, *, config: ChunkBySentences
    ) -> Messages:
        from data_validation_engine_spark.llmops.chunking import (
            chunk_by_sentences,
        )

        entities[config.output_name] = chunk_by_sentences(
            entities[config.entity_name],
            config.key_column,
            config.text_column,
            max_tokens=config.max_tokens,
            overlap_sentences=config.overlap_sentences,
            min_chars=config.min_chars,
        )
        return None

    def chunk_by_content(
        self, entities: Entities, *, config: ChunkByContent
    ) -> Messages:
        from data_validation_engine_spark.llmops.chunking import (
            chunk_by_content,
        )

        entities[config.output_name] = chunk_by_content(
            entities[config.entity_name],
            config.key_column,
            config.text_column,
            target_tokens=config.target_tokens,
            min_tokens=config.min_tokens,
            max_tokens=config.max_tokens,
            gram=config.gram,
            seed=config.seed,
        )
        return None

    def script_profile(
        self, entities: Entities, *, config: ScriptProfile
    ) -> Messages:
        from data_validation_engine_spark.llmops.text import script_profile

        entities[config.output_name] = script_profile(
            entities[config.entity_name],
            config.text_column,
            prefix=config.prefix,
        )
        return None

    def compression_ratio(
        self, entities: Entities, *, config: CompressionRatio
    ) -> Messages:
        from data_validation_engine_spark.llmops.compress import (
            compression_ratio,
        )

        entities[config.output_name] = compression_ratio(
            entities[config.entity_name],
            config.text_column,
            level=config.level,
            output_col=config.output_column,
        )
        return None

    def materialize_packs(
        self, entities: Entities, *, config: MaterializePacks
    ) -> Messages:
        from data_validation_engine_spark.llmops.chunking import (
            materialize_packs,
        )

        entities[config.output_name] = materialize_packs(
            entities[config.entity_name],
            config.key_column,
            config.ids_column,
            capacity=config.capacity,
            n_shards=config.n_shards,
            seed=config.seed,
            pad_id=config.pad_token_id,
            eod_id=config.eod_token_id,
        )
        return None

    def extract_html_text(
        self, entities: Entities, *, config: ExtractHtmlText
    ) -> Messages:
        from data_validation_engine_spark.llmops.web import (
            extract_html_text,
        )

        entities[config.output_name] = extract_html_text(
            entities[config.entity_name],
            config.html_column,
            unescape=config.unescape,
            output_col=config.output_column,
        )
        return None

    def parse_json(
        self, entities: Entities, *, config: ParseJson
    ) -> Messages:
        from data_validation_engine_spark.llmops.web import (
            parse_json_column,
        )

        entities[config.output_name] = parse_json_column(
            entities[config.entity_name],
            config.json_column,
            config.json_schema,
            output_col=config.output_column,
            valid_col=config.valid_column,
        )
        return None

    def cms_sketch(
        self, entities: Entities, *, config: CmsSketch
    ) -> Messages:
        from data_validation_engine_spark.llmops.sketch import (
            cms_build,
            cms_merge,
            cms_query,
        )

        groups = list(config.group_by)
        df = entities[config.entity_name]
        if config.mode == "merge":
            entities[config.output_name] = cms_merge(df, groups)
        elif config.mode == "query":
            if not config.sketch_name:
                raise ValueError(
                    "cms_sketch mode='query' needs sketch_name"
                )
            entities[config.output_name] = cms_query(
                entities[config.sketch_name],
                df,
                config.value_column,
                group_cols=groups,
                depth=config.depth,
                width=config.width,
                seed=config.seed,
            )
        else:
            entities[config.output_name] = cms_build(
                df,
                config.value_column,
                group_cols=groups,
                depth=config.depth,
                width=config.width,
                weight_col=config.weight_column,
                seed=config.seed,
            )
        return None

    def bloom_filter(
        self, entities: Entities, *, config: BloomFilter
    ) -> Messages:
        from data_validation_engine_spark.llmops.sketch import (
            bloom_build,
            bloom_merge,
            bloom_might_contain,
        )

        groups = list(config.group_by)
        df = entities[config.entity_name]
        if config.mode == "merge":
            entities[config.output_name] = bloom_merge(df, groups)
        elif config.mode == "query":
            if not config.bloom_name:
                raise ValueError(
                    "bloom_filter mode='query' needs bloom_name"
                )
            entities[config.output_name] = bloom_might_contain(
                entities[config.bloom_name],
                df,
                config.value_column,
                group_cols=groups,
                m_bits=config.m_bits,
                k_hashes=config.k_hashes,
                seed=config.seed,
            )
        else:
            entities[config.output_name] = bloom_build(
                df,
                config.value_column,
                group_cols=groups,
                m_bits=config.m_bits,
                k_hashes=config.k_hashes,
                seed=config.seed,
            )
        return None

    def dsir_resample(
        self, entities: Entities, *, config: DsirResample
    ) -> Messages:
        from data_validation_engine_spark.llmops import dsir

        df = entities[config.entity_name]
        keys = list(config.key_columns)
        if config.mode == "counts":
            entities[config.output_name] = dsir.dsir_bucket_counts(
                df,
                config.text_column,
                n_max=config.n_max,
                buckets=config.buckets,
                seed=config.seed,
                lowercase=config.lowercase,
            )
        elif config.mode == "ratio":
            if not config.target_name:
                raise ValueError(
                    "dsir_resample mode='ratio' needs target_name "
                    "(the target corpus's count entity)"
                )
            entities[config.output_name] = dsir.dsir_log_ratio(
                entities[config.target_name],
                df,
                buckets=config.buckets,
                alpha=config.alpha,
            )
        elif config.mode == "score":
            if not config.ratio_name:
                raise ValueError(
                    "dsir_resample mode='score' needs ratio_name"
                )
            entities[config.output_name] = dsir.dsir_score(
                df,
                config.text_column,
                entities[config.ratio_name],
                key_cols=keys,
                n_max=config.n_max,
                buckets=config.buckets,
                seed=config.seed,
                lowercase=config.lowercase,
                normalize=config.normalize,
                broadcast_ratios=config.broadcast_ratios,
            )
        else:
            if not keys:
                raise ValueError(
                    "dsir_resample mode='select' needs key_columns[0] "
                    "(the Gumbel noise key)"
                )
            entities[config.output_name] = dsir.gumbel_topk(
                df,
                config.logw_column,
                config.n_select,
                key_col=keys[0],
                seed=config.seed,
                temperature=config.temperature,
            )
        return None

    def rrf_fuse(
        self, entities: Entities, *, config: RrfFuse
    ) -> Messages:
        from data_validation_engine_spark.llmops.fusion import rrf_fuse

        frames = [entities[config.entity_name]] + [
            entities[n] for n in config.more_entities
        ]
        entities[config.output_name] = rrf_fuse(
            frames,
            query_cols=list(config.query_columns),
            doc_col=config.doc_column,
            rank_col=config.rank_column,
            k=config.k,
            scale=config.scale,
            top_n=config.top_n,
        )
        return None

    def negative_samples(
        self, entities: Entities, *, config: NegativeSamples
    ) -> Messages:
        from data_validation_engine_spark.llmops.split import (
            negative_samples,
        )

        entities[config.output_name] = negative_samples(
            entities[config.entity_name],
            entities[config.pool_name],
            config.anchor_column,
            config.pool_column,
            k=config.k,
            seed=config.seed,
            exclude_self=config.exclude_self,
            pool_cols=list(config.pool_columns),
        )
        return None

    def extract_links(
        self, entities: Entities, *, config: ExtractLinks
    ) -> Messages:
        from data_validation_engine_spark.llmops.web import extract_links

        entities[config.output_name] = extract_links(
            entities[config.entity_name],
            config.html_column,
            base_url_col=config.base_url_column,
            output_col=config.output_column,
            unique=config.unique,
        )
        return None

    def extract_anchor_texts(
        self, entities: Entities, *, config: ExtractAnchorTexts
    ) -> Messages:
        from data_validation_engine_spark.llmops.web import (
            extract_anchor_texts,
        )

        entities[config.output_name] = extract_anchor_texts(
            entities[config.entity_name],
            config.html_column,
            output_href=config.output_href,
            output_text=config.output_text,
        )
        return None

    def remove_repeated_substrings(
        self, entities: Entities, *, config: RemoveRepeatedSubstrings
    ) -> Messages:
        from data_validation_engine_spark.llmops.substrings import (
            remove_repeated_substrings,
        )

        entities[config.output_name] = remove_repeated_substrings(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            min_len=config.min_len,
            min_docs=config.min_docs,
            depth=config.depth,
            width=config.width,
            seed=config.seed,
            out_col=config.output_column,
            exact_verify=config.exact_verify,
        )
        return None

    def classifier_fit(
        self, entities: Entities, *, config: ClassifierFit
    ) -> Messages:
        from data_validation_engine_spark.llmops.classifier import (
            classifier_fit,
        )

        weights, bias = classifier_fit(
            entities[config.entity_name],
            config.text_column,
            config.label_column,
            n_buckets=config.n_buckets,
            n_max=config.n_max,
            seed=config.seed,
            average=config.average,
            char_n=config.char_n,
            epochs=config.epochs,
            lr=config.lr,
            l2=config.l2,
        )
        spark = entities[config.entity_name].sparkSession
        # bucket -2 declares n_buckets (ADVICE r11): a partially read
        # or written entity that lost TRAILING bucket rows would
        # otherwise reconstruct a smaller feature space and score
        # everything wrong silently — the sentinel lets the consumer
        # validate completeness instead of inferring it from max()
        entities[config.output_name] = spark.createDataFrame(
            [(-2, float(len(weights))), (-1, float(bias))]
            + [(b, float(w)) for b, w in enumerate(weights)],
            "bucket int, weight double",
        )
        return None

    def _resolve_pq_codebooks(self, entities: Entities, config, table):
        """Shared codebook resolution for the PQ search steps: inline
        literal, a ``pq_fit`` output entity (bounded m×k+1-row collect
        with dense-grid validation — the classifier weights-entity
        discipline), or the deterministic placeholder."""
        from data_validation_engine_spark.llmops.pq import (
            default_codebooks,
            pq_codebooks_from_rows,
        )

        if (
            config.codebooks is not None
            and config.codebooks_entity is not None
        ):
            raise ConfigurationError(
                f"{config.operation}: pass at most one of codebooks / "
                "codebooks_entity"
            )
        if config.codebooks:
            return [[list(cw) for cw in book] for book in config.codebooks]
        if config.codebooks_entity is not None:
            return pq_codebooks_from_rows(
                entities[config.codebooks_entity].collect()
            )
        return default_codebooks(
            table,
            id_col=config.id_column,
            vec_col=config.vector_column,
            dim=config.dim,
            m=config.pq_m,
            k=config.pq_k,
        )

    def pq_topk_many(
        self, entities: Entities, *, config: PQTopKMany
    ) -> Messages:
        from data_validation_engine_spark.llmops.pq import (
            ivf_pq_topk_many,
            pq_topk_many,
        )

        table = entities[config.entity_name]
        queries = entities[config.target_name]
        books = self._resolve_pq_codebooks(entities, config, table)
        if config.cell_column is not None and config.centroids is None:
            raise ConfigurationError(
                "pq_topk_many: cell_column needs centroids (the query "
                "side must rank the same quantizer's cells to probe)"
            )
        kw = dict(
            codebooks=books,
            id_col=config.id_column,
            vec_col=config.vector_column,
            codes_col=config.codes_column,
            query_id_col=config.query_id_column,
            exclude_self=config.exclude_self,
        )
        if config.centroids is not None:
            entities[config.output_name] = ivf_pq_topk_many(
                table,
                queries,
                config.k,
                centroids=[list(c) for c in config.centroids],
                cell_col=config.cell_column,
                n_probe=config.n_probe,
                **kw,
            )
        else:
            entities[config.output_name] = pq_topk_many(
                table, queries, config.k, **kw
            )
        return None

    def url_blocklist(
        self, entities: Entities, *, config: UrlBlocklist
    ) -> Messages:
        from data_validation_engine_spark.llmops.web import url_blocklist

        entities[config.output_name] = url_blocklist(
            entities[config.entity_name],
            entities[config.target_name],
            config.url_column,
            id_col=config.id_column,
            blocked_host_col=config.blocked_host_column,
            host_col=config.host_column,
            max_labels=config.max_labels,
            flag_col=config.flag_column,
        )
        return None

    def c4_clean(
        self, entities: Entities, *, config: C4Clean
    ) -> Messages:
        from data_validation_engine_spark.llmops.c4 import c4_clean

        entities[config.output_name] = c4_clean(
            entities[config.entity_name],
            config.text_column,
            min_line_words=config.min_line_words,
            min_sentences=config.min_sentences,
            clean_col=config.clean_column,
            keep_col=config.keep_column,
        )
        return None

    def gopher_quality_flags(
        self, entities: Entities, *, config: GopherQualityFlags
    ) -> Messages:
        from data_validation_engine_spark.llmops.gopher import (
            gopher_quality_flags,
        )

        entities[config.output_name] = gopher_quality_flags(
            entities[config.entity_name],
            config.text_column,
            min_words=config.min_words,
            max_words=config.max_words,
            min_mean_word_len=config.min_mean_word_len,
            max_mean_word_len=config.max_mean_word_len,
            max_symbol_word_ratio=config.max_symbol_word_ratio,
            max_bullet_line_frac=config.max_bullet_line_frac,
            max_ellipsis_line_frac=config.max_ellipsis_line_frac,
            min_alpha_word_frac=config.min_alpha_word_frac,
            min_stop_words=config.min_stop_words,
            keep_col=config.keep_column,
        )
        return None

    def mojibake_stats(
        self, entities: Entities, *, config: MojibakeStats
    ) -> Messages:
        from data_validation_engine_spark.llmops.normalize import (
            mojibake_stats,
        )

        entities[config.output_name] = mojibake_stats(
            entities[config.entity_name], config.text_column
        )
        return None

    def fix_mojibake(
        self, entities: Entities, *, config: FixMojibake
    ) -> Messages:
        from data_validation_engine_spark.llmops.normalize import (
            fix_mojibake,
        )

        entities[config.output_name] = fix_mojibake(
            entities[config.entity_name],
            config.text_column,
            output_col=config.output_column,
            flag_col=config.flag_column,
        )
        return None

    def gopher_repetition_flags(
        self, entities: Entities, *, config: GopherRepetitionFlags
    ) -> Messages:
        from data_validation_engine_spark.llmops.gopher import (
            gopher_repetition_flags,
        )

        entities[config.output_name] = gopher_repetition_flags(
            entities[config.entity_name],
            config.text_column,
            max_dup_line_frac=config.max_dup_line_frac,
            max_dup_para_frac=config.max_dup_para_frac,
            max_dup_line_char_frac=config.max_dup_line_char_frac,
            max_dup_para_char_frac=config.max_dup_para_char_frac,
            max_top_gram_fracs=tuple(config.max_top_gram_fracs),
            max_dup_gram_fracs=tuple(config.max_dup_gram_fracs),
            keep_col=config.keep_column,
        )
        return None

    def pq_encode(
        self, entities: Entities, *, config: PQEncode
    ) -> Messages:
        from data_validation_engine_spark.llmops.ivf import ivf_assign
        from data_validation_engine_spark.llmops.pq import pq_encode

        table = entities[config.entity_name]
        books = self._resolve_pq_codebooks(entities, config, table)
        if config.centroids is not None:
            table = ivf_assign(
                table,
                [list(c) for c in config.centroids],
                vec_col=config.vector_column,
                cell_col=config.cell_column,
            )
        entities[config.output_name] = pq_encode(
            table,
            books,
            vec_col=config.vector_column,
            codes_col=config.codes_column,
            keep_vec=config.keep_vector,
        )
        return None

    def pq_fit(self, entities: Entities, *, config: PQFit) -> Messages:
        from data_validation_engine_spark.llmops.pq import (
            pq_codebooks_to_rows,
            pq_fit,
        )

        books = pq_fit(
            entities[config.entity_name],
            id_col=config.id_column,
            vec_col=config.vector_column,
            dim=config.dim,
            m=config.pq_m,
            k=config.pq_k,
            n_iters=config.n_iters,
            round_to=config.round_to,
        )
        spark = entities[config.entity_name].sparkSession
        # (-1, -1, [m, k, dsub]) geometry sentinel included by the
        # exporter — the consumer validates the full grid instead of
        # inferring it (the classifier_fit bucket=-2 discipline)
        entities[config.output_name] = spark.createDataFrame(
            pq_codebooks_to_rows(books),
            "subspace int, code int, centroid array<double>",
        )
        return None

    def ann_recall(
        self, entities: Entities, *, config: AnnRecall
    ) -> Messages:
        from data_validation_engine_spark.llmops.recall import ann_recall

        entities[config.output_name] = ann_recall(
            entities[config.entity_name],
            entities[config.target_name],
            id_col=config.id_column,
            group_cols=list(config.group_columns),
            k=config.k,
            recall_col=config.recall_column,
        )
        return None

    def pair_recall(
        self, entities: Entities, *, config: PairRecall
    ) -> Messages:
        from data_validation_engine_spark.llmops.recall import pair_recall

        entities[config.output_name] = pair_recall(
            entities[config.entity_name],
            entities[config.target_name],
            id_a=config.id_a_column,
            id_b=config.id_b_column,
            group_cols=list(config.group_columns),
            broadcast_exact=config.broadcast_exact,
        )
        return None

    def _resolve_classifier_weights(
        self, entities: Entities, config: "ClassifierScore"
    ) -> tuple[list[float], float]:
        if (config.weights is None) == (config.weights_entity is None):
            raise ConfigurationError(
                "classifier_score: pass exactly one of weights / "
                "weights_entity"
            )
        if config.weights is not None:
            return list(config.weights), config.bias
        # bounded collect: the weights entity is n_buckets+1 rows by
        # the classifier_fit contract
        rows = entities[config.weights_entity].collect()
        bias = None
        declared = None
        pairs: dict[int, float] = {}
        for r in rows:
            if r["bucket"] == -2:
                declared = int(r["weight"])
            elif r["bucket"] == -1:
                bias = float(r["weight"])
            else:
                pairs[int(r["bucket"])] = float(r["weight"])
        if not pairs:
            raise ConfigurationError(
                f"classifier_score: weights entity "
                f"'{config.weights_entity}' holds no bucket rows"
            )
        # completeness check (ADVICE r11): classifier_fit writes one
        # row per bucket 0..n_buckets-1, a bias row (-1), and an
        # n_buckets sentinel (-2). A sparser entity (filtered read,
        # partial write) silently SHRINKS the feature space — every
        # n-gram then hashes to a different bucket and all scores are
        # wrong with no error — so fail loudly instead. The sentinel
        # also catches TRAILING loss, which density alone cannot.
        n = declared if declared is not None else max(pairs) + 1
        if len(pairs) != n or max(pairs) != n - 1 or bias is None:
            missing = (
                "bias row (bucket = -1)"
                if bias is None
                else f"{n - len(pairs)} of {n} bucket rows"
            )
            raise ConfigurationError(
                f"classifier_score: weights entity "
                f"'{config.weights_entity}' is not a dense "
                f"classifier_fit export — missing {missing}; "
                "re-export the fitted weights without filtering"
            )
        return [pairs.get(b, 0.0) for b in range(n)], bias

    def classifier_score(
        self, entities: Entities, *, config: ClassifierScore
    ) -> Messages:
        from data_validation_engine_spark.llmops.classifier import (
            classifier_filter,
            classifier_score,
        )

        weights, bias = self._resolve_classifier_weights(
            entities, config
        )
        if config.threshold_prob is not None:
            entities[config.output_name] = classifier_filter(
                entities[config.entity_name],
                config.text_column,
                weights,
                bias=bias,
                n_max=config.n_max,
                seed=config.seed,
                average=config.average,
                char_n=config.char_n,
                threshold_prob=config.threshold_prob,
                keep_col=config.keep_column,
                score_col=config.score_column,
            )
        else:
            entities[config.output_name] = classifier_score(
                entities[config.entity_name],
                config.text_column,
                weights,
                bias=bias,
                n_max=config.n_max,
                seed=config.seed,
                average=config.average,
                char_n=config.char_n,
                out_col=config.score_column,
                prob_col=config.prob_column,
            )
        return None

    def classifier_eval(
        self, entities: Entities, *, config: ClassifierEval
    ) -> Messages:
        from data_validation_engine_spark.llmops.classifier import (
            classifier_eval,
        )

        # same weight resolution (and dense-export validation) as
        # classifier_score — train -> eval -> filter compose over one
        # weights entity
        weights, bias = self._resolve_classifier_weights(
            entities, config
        )
        entities[config.output_name] = classifier_eval(
            entities[config.entity_name],
            config.text_column,
            config.label_column,
            weights,
            bias=bias,
            n_max=config.n_max,
            seed=config.seed,
            average=config.average,
            char_n=config.char_n,
            threshold_prob=config.threshold_prob,
            group_cols=list(config.group_columns) or None,
        )
        return None

    def compact_minhash_index(
        self, entities: Entities, *, config: CompactMinhashIndex
    ) -> Messages:
        from data_validation_engine_spark.llmops.dedup import (
            compact_minhash_index,
        )

        entities[config.output_name] = compact_minhash_index(
            entities[config.entity_name],
            entities[config.live_entity],
            config.id_column,
        )
        return None

    def windowed_heavy_hitters(
        self, entities: Entities, *, config: WindowedHeavyHitters
    ) -> Messages:
        from data_validation_engine_spark.llmops.sketch import (
            windowed_heavy_hitters,
        )

        entities[config.output_name] = windowed_heavy_hitters(
            entities[config.cells_entity],
            entities[config.entity_name],
            config.ts_column,
            config.value_column,
            config.min_count,
            window_seconds=config.window_seconds,
            depth=config.depth,
            width=config.width,
            seed=config.seed,
            check_totals=config.check_totals,
        )
        return None

    def heavy_hitters(
        self, entities: Entities, *, config: HeavyHitters
    ) -> Messages:
        from data_validation_engine_spark.llmops.sketch import heavy_hitters

        entities[config.output_name] = heavy_hitters(
            entities[config.entity_name],
            config.value_column,
            config.min_count,
            weight_col=config.weight_column,
            depth=config.depth,
            width=config.width,
            seed=config.seed,
        )
        return None

    def interleave_sources(
        self, entities: Entities, *, config: InterleaveSources
    ) -> Messages:
        from data_validation_engine_spark.llmops.split import (
            interleave_sources,
        )

        entities[config.output_name] = interleave_sources(
            entities[config.entity_name],
            config.source_column,
            dict(config.weights),
            config.key_column,
            seed=config.seed,
            order_col=config.order_column,
        )
        return None

    def hard_negative_samples(
        self, entities: Entities, *, config: HardNegativeSamples
    ) -> Messages:
        from data_validation_engine_spark.llmops.similarity import (
            hard_negative_samples,
        )

        entities[config.output_name] = hard_negative_samples(
            entities[config.entity_name],
            config.k,
            id_col=config.id_column,
            vec_col=config.vector_column,
            min_cosine=config.min_cosine,
            max_cosine=config.max_cosine,
            candidate_factor=config.candidate_factor,
            n_planes=config.n_planes,
            n_tables=config.n_tables,
            dim=config.dim,
        )
        return None

    def parse_robots(
        self, entities: Entities, *, config: ParseRobots
    ) -> Messages:
        from data_validation_engine_spark.llmops.robots import parse_robots

        entities[config.output_name] = parse_robots(
            entities[config.entity_name],
            config.host_column,
            config.robots_column,
        )
        return None

    def robots_allowed(
        self, entities: Entities, *, config: RobotsAllowed
    ) -> Messages:
        from data_validation_engine_spark.llmops.robots import (
            robots_allowed,
        )

        entities[config.output_name] = robots_allowed(
            entities[config.entity_name],
            entities[config.rules_name],
            config.url_column,
            agent=config.agent,
            host_col=config.host_column,
            out_col=config.output_column,
        )
        return None

    def bpe_train(
        self, entities: Entities, *, config: BpeTrain
    ) -> Messages:
        from data_validation_engine_spark.llmops.bpe import bpe_train

        merges = bpe_train(
            entities[config.entity_name],
            config.text_column,
            n_merges=config.n_merges,
            lowercase=config.lowercase,
        )
        entities[config.output_name] = self.spark.createDataFrame(
            [(i, l, r) for i, (l, r) in enumerate(merges)],
            "rank int, left string, right string",
        )
        return None

    def bpe_encode(
        self, entities: Entities, *, config: BpeEncode
    ) -> Messages:
        from data_validation_engine_spark.llmops.bpe import bpe_encode

        # merge table is K rows by construction — a bounded collect
        merges = [
            (r["left"], r["right"])
            for r in entities[config.merges_name]
            .orderBy("rank")
            .collect()
        ]
        entities[config.output_name] = bpe_encode(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            merges,
            lowercase=config.lowercase,
        )
        return None

    def repartition(
        self, entities: Entities, *, config: Repartition
    ) -> Messages:
        df = entities[config.entity_name]
        cols = [F.col(c) for c in config.columns]
        if config.mode == "coalesce":
            if config.n is None:
                raise ValueError("coalesce requires n")
            out = df.coalesce(config.n)
        elif config.mode == "range":
            if not cols:
                raise ValueError("range repartition requires columns")
            out = (
                df.repartitionByRange(config.n, *cols)
                if config.n
                else df.repartitionByRange(*cols)
            )
        else:
            if config.n and cols:
                out = df.repartition(config.n, *cols)
            elif cols:
                out = df.repartition(*cols)
            elif config.n:
                out = df.repartition(config.n)
            else:
                raise ValueError("hash repartition requires n or columns")
        entities[config.output_name] = out
        return None

    def sql_query(
        self, entities: Entities, *, config: SqlQuery
    ) -> Messages:
        names = dict.fromkeys([config.entity_name, *config.inputs])
        # entity names become spark.sql(**kwargs) template frames, so they
        # must be valid Python identifiers, and 'args' is reserved by
        # pyspark's spark.sql(..., args=...) parameter — an entity named
        # 'args' would silently bind as the parameter dict instead of a
        # {args} template frame (round-9 fix, ADVICE r8)
        for n in names:
            if not n.isidentifier() or n == "args":
                reason = (
                    "collides with pyspark's reserved spark.sql 'args' "
                    "parameter" if n == "args"
                    else "is not a valid identifier"
                )
                raise ConfigurationError(
                    f"sql_query entity name {n!r} {reason}; rename the "
                    "entity (copy_entity/rename_entity) before the SQL "
                    "step"
                )
        frames = {n: entities[n] for n in names}
        entities[config.output_name] = self.spark.sql(
            config.query, **frames
        )
        return None

    def ecdf_normalize(
        self, entities: Entities, *, config: EcdfNormalize
    ) -> Messages:
        from data_validation_engine_spark.llmops.stats import (
            ecdf_normalize,
        )

        entities[config.output_name] = ecdf_normalize(
            entities[config.entity_name],
            config.value_column,
            group_cols=list(config.group_by) if config.group_by else None,
            out_col=config.output_column,
            round_to=config.round_to,
        )
        return None

    def bucket_by_length(
        self, entities: Entities, *, config: BucketByLength
    ) -> Messages:
        from data_validation_engine_spark.llmops.chunking import (
            bucket_by_length,
        )

        entities[config.output_name] = bucket_by_length(
            entities[config.entity_name],
            config.id_column,
            config.text_column,
            batch_size=config.batch_size,
            bucket_edges=list(config.bucket_edges)
            if config.bucket_edges
            else None,
            n_shards=config.n_shards,
            seed=config.seed,
        )
        return None

    def unpivot(self, entities: Entities, *, config: Unpivot) -> Messages:
        entities[config.output_name] = entities[
            config.entity_name
        ].unpivot(
            list(config.id_columns),
            list(config.value_columns),
            config.variable_column,
            config.value_column,
        )
        return None

    def project_vectors(
        self, entities: Entities, *, config: ProjectVectors
    ) -> Messages:
        from data_validation_engine_spark.llmops.vectors import (
            project_vectors,
            projection_matrix,
        )

        entities[config.output_name] = project_vectors(
            entities[config.entity_name],
            config.id_column,
            config.vector_column,
            projection_matrix(
                config.in_dim, config.out_dim, seed=config.seed
            ),
        )
        return None
