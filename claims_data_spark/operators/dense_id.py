"""Scalable global dense ranking (SURVEY.md §4 item 2).

The reference assigns warehouse-wide event ids with
``DENSE_RANK() OVER (ORDER BY ...)`` — an un-partitioned window
(``load_stage.mcaid_claim_header.R:865-967``). On Spark that funnels
the whole table through ONE task; fine at 60k rows, fatal at 100 TB.

``dense_global_id`` keeps the same semantics (dense, 1-based, ordered
by the given columns) with a two-phase plan:

1. distinct key tuples (partial-aggregated map-side; the distinct set
   is orders of magnitude smaller than the fact table),
2. range-repartition by the key order so partitions are themselves
   ordered,
3. per-partition ``row_number`` (parallel windows), plus a prefix-sum
   of per-partition counts (only #partitions integers ever reach the
   driver) as offsets,
4. broadcast the tiny key->id map back onto the fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lazy_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=False)`` that is ACTUALLY lazy.

    Under adaptive execution, converting a plan to an RDD (which
    checkpointing does at call time) materializes every shuffle query
    stage immediately — a builder that mints id families mid-plan then
    runs a serial cascade of blocking stage jobs at DataFrame-BUILD
    time, before any action. Planning the checkpointed subtree with
    AQE off keeps the conversion a pure plan-to-RDD mapping, so the
    whole subtree executes inside the caller's first real action (and
    the checkpointed RDD still truncates lineage for everything
    downstream). The subtree loses AQE's runtime coalescing — it is a
    keys-sized frame with an explicit range partitioning, which is
    exactly the case where the static plan is already right."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.localCheckpoint(eager=False)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _eager_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` executed with AQE disabled.

    Three effects, all wanted for the small/bounded frames the minting
    pipeline stabilizes: (1) the subtree runs as ONE statically-planned
    job instead of an AQE stage-per-shuffle cascade; (2) downstream
    consumers read materialized blocks, so concurrent AQE leaf stages
    can't race to recompute the same partitions (per-partition cache
    locks make racing stages redo the whole upstream — measured as N
    identical full-cost jobs); (3) lineage truncates, keeping chained
    builder plans and planning time bounded. The trade (a lost
    executor costs a job retry) is the documented one for keys-sized
    frames."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _stable_ranked(
    ranked: DataFrame, truncate_lineage: bool, cache_registry: list | None
) -> DataFrame:
    """Stabilize the ranked-keys frame for its two consumers (offsets
    subplan + final join).

    ``truncate_lineage=True`` (default): lazy localCheckpoint — cuts
    the logical plan so CHAINED builders (header -> combined layer,
    each minting several id families) don't grow multiplicative plan
    trees until planning OOMs. Even with AQE disabled for the subtree
    (see ``_lazy_checkpoint``), instantiating the checkpoint RDD makes
    the range partitioner sample its boundaries eagerly, so the keys
    upstream executes at build time.

    ``truncate_lineage=False``: plain persist — the whole dense-id
    plan stays lazy (zero jobs until the caller's first action) and
    both consumers read the cache. Right for a STANDALONE builder
    whose plan is bounded; wrong for deep builder chains."""
    if truncate_lineage:
        return _lazy_checkpoint(ranked)
    out = ranked.persist()
    if cache_registry is not None:
        cache_registry.append(out)
    return out


def dense_global_id(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "global_id",
    num_partitions: int | None = None,
    persist_input: bool = False,
    cache_registry: list | None = None,
    truncate_lineage: bool = True,
) -> DataFrame:
    """Attach a globally dense 1-based id ordered by ``order_cols``.

    ``persist_input=True`` caches ``df`` across the offsets job and the
    final join — use it when ``df`` is an already-reduced frame (e.g.
    collapsed episodes) whose upstream plan is expensive. Leave False
    for warehouse-scale inputs: caching 100 TB to save one columnar
    re-scan is a bad trade, and only the tiny ranked-key frame (always
    persisted) must be stable for correctness.

    Long-lived sessions: ``df`` under ``persist_input`` is appended to
    ``cache_registry`` when one is passed — after materializing the
    result, call ``.unpersist()`` on each to release executor memory.
    (The ranked-key frame itself is a lazy ``localCheckpoint``, whose
    storage is reclaimed with the RDD, not via unpersist.)"""
    if persist_input:
        df = df.persist()
        if cache_registry is not None:
            cache_registry.append(df)
    # Persist the distinct keys: instantiating the range partitioner
    # below runs an EAGER boundary-sampling pass over them at
    # plan-build time, and without the cache the first real action
    # would recompute the whole upstream (often a full table assembly)
    # a second time just to rank the keys. Keys are the reduced
    # (order_cols-distinct) frame — MEMORY_AND_DISK at warehouse scale.
    keys = df.select(*order_cols).distinct().persist()
    if cache_registry is not None:
        cache_registry.append(keys)
    if num_partitions:
        keys = keys.repartitionByRange(num_partitions, *order_cols)
    else:
        keys = keys.repartitionByRange(*order_cols)

    with_pid = keys.withColumn("_pid", F.spark_partition_id())
    w_in = Window.partitionBy("_pid").orderBy(*order_cols)
    # Lazy localCheckpoint, not persist: the ranked keys feed BOTH the
    # offsets subplan and the final join, and under the all-lazy design
    # each broadcast subtree would otherwise re-embed the entire
    # upstream lineage — chained builders (header -> combined layer,
    # each minting several id families) make the physical plan grow
    # multiplicatively until planning itself OOMs. Checkpointing the
    # (small) ranked-key frame truncates lineage at a stable point;
    # losing an executor costs a job retry, which is the right trade
    # for a keys-sized frame.
    ranked = _stable_ranked(
        with_pid.withColumn("_rn", F.row_number().over(w_in)),
        truncate_lineage, cache_registry,
    )

    # Offsets: prefix-sum of per-partition counts. The counts frame has
    # ONE row per shuffle partition, so the un-partitioned running-sum
    # window is a bounded single task — and keeping it as a lazy plan
    # (rather than a driver collect) means a builder that mints several
    # independent id families (the APCD header mints four) stays ONE
    # action instead of a serial chain of blocking collect jobs.
    counts = ranked.groupBy("_pid").agg(F.max("_rn").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offset_df = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
    )
    key_ids = (
        ranked.join(F.broadcast(offset_df), "_pid")
        .withColumn(out_col, (F.col("_rn") + F.col("_off")).cast("long"))
        .select(*order_cols, out_col)
    )
    # plain shuffle join back to the rows: AQE converts it to broadcast
    # at runtime whenever the key->id map is under the threshold, so a
    # driver-side size heuristic here would be redundant. Null-safe
    # equality: order_cols may legitimately contain nulls (e.g. the
    # xwalk's optional match columns) and a null-unsafe equi-join would
    # silently drop those rows.
    aliased = key_ids.select(
        *[F.col(c).alias(f"_key_{c}") for c in order_cols], out_col
    )
    cond = None
    for c in order_cols:
        clause = df[c].eqNullSafe(aliased[f"_key_{c}"])
        cond = clause if cond is None else (cond & clause)
    return df.join(aliased, cond).drop(*[f"_key_{c}" for c in order_cols])


def dense_rank_inline(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "global_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a globally dense 1-based id ordered by ``order_cols``
    directly on the rows: ONE range exchange + ONE Arrow pass.

    Same semantics as ``dense_global_id`` (the reference's
    un-partitioned ``DENSE_RANK() OVER (ORDER BY ...)``,
    ``load_stage.mcaid_claim_header.R:865-967``) with the plan shape
    proven by ``dense_event_ids_inline``: range-partition the rows by
    the key order, sort within partitions, count key CHANGES in a
    vectorized pass (running count of distinct keys == dense rank),
    then lift per-partition counts into prefix-sum offsets (#partitions
    rows broadcast back on ``_pid``).

    vs the keys-map form: no distinct shuffle, no key->id join-back at
    fact grain — right when the key grain is within a small factor of
    the row count (claim events, standalone rankings). Keep
    ``dense_global_id`` when keys << rows (ranking a reduced dimension
    against a 100 TB fact table: exchanging the facts by range costs
    more than the distinct + broadcast join-back).

    Null handling is eqNullSafe-style: a NULL key value equals itself
    and keys containing NULLs get ids in Spark's null-first range
    order, matching ``DENSE_RANK``'s treatment. Float NaN likewise
    equals itself (one rank group — Spark's NaN semantics), via a
    per-key state channel (null / value / NaN) compared alongside the
    NaN-masked values, so no sentinel pre-coalescing is required.
    """
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *order_cols)
    else:
        ranged = df.repartitionByRange(*order_cols)
    ranged = ranged.sortWithinPartitions(*order_cols)

    fields = ", ".join(f"`{n}` {t}" for n, t in df.dtypes)
    out_schema = fields + ", `_pid` int, `_loc` long"

    def _key_arrays(batch, names):
        """Per key column: (state int8 array, value numpy array).

        ``state`` is 0 for NULL, 1 for an ordinary value, 2 for a float
        NaN VALUE — DENSE_RANK treats NaN as equal to itself (one rank
        group), but numpy's ``vals[1:] != vals[:-1]`` is True for
        adjacent NaNs, so NaN gets its own state channel (values masked
        to 0.0) exactly like NULLs do.
        """
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        out = []
        for c in order_cols:
            arr = batch.column(names.index(c))
            state = arr.is_valid().to_numpy(
                zero_copy_only=False
            ).astype(np.int8)
            if pa.types.is_date32(arr.type):
                arr = pc.cast(arr, pa.int32())
            elif pa.types.is_date64(arr.type) or pa.types.is_timestamp(
                arr.type
            ):
                arr = arr.view(pa.int64())
            vals = arr.to_numpy(zero_copy_only=False)
            # nulls surface as NaN/None/NaT; mask them to a fixed value
            # so value comparison is deterministic and the state channel
            # alone decides null-vs-NaN-vs-value changes
            if vals.dtype == object:
                vals = np.where(state == 1, vals, "")
            elif np.issubdtype(vals.dtype, np.floating):
                state[(state == 1) & np.isnan(vals)] = 2
                vals = np.where(state == 1, vals, 0.0)
            out.append((state, vals))
        return out

    def _running(iterator):
        from pyspark import TaskContext
        import numpy as np
        import pyarrow as pa

        pid = TaskContext.get().partitionId()
        run = 0
        has_carry = False
        carry = None  # list of (valid: bool, value) for the last row
        for batch in iterator:
            m = batch.num_rows
            if m == 0:
                continue
            names = batch.schema.names
            keys = _key_arrays(batch, names)
            change = np.zeros(m, dtype=bool)
            change[0] = True
            for state, vals in keys:
                change[1:] |= state[1:] != state[:-1]
                change[1:] |= (
                    (state[1:] == 1) & (state[:-1] == 1)
                    & (vals[1:] != vals[:-1])
                )
            if has_carry:
                same = all(
                    (int(state[0]) == cs)
                    and (cs != 1 or vals[0] == cvv)
                    for (state, vals), (cs, cvv) in zip(keys, carry)
                )
                change[0] = not same
            locs = run + np.cumsum(change.astype("int64"))
            run = int(locs[-1])
            has_carry = True
            carry = [
                (int(state[-1]), vals[-1]) for state, vals in keys
            ]
            arrays = list(batch.columns)
            arrays.append(pa.array(np.full(m, pid, dtype="int32")))
            arrays.append(pa.array(locs))
            yield pa.RecordBatch.from_arrays(
                arrays, names=names + ["_pid", "_loc"]
            )

    ranked = _eager_checkpoint(ranged.mapInArrow(_running, out_schema))
    # offsets: prefix-sum of per-partition totals. The totals frame is
    # ONE long per physical partition (bounded metadata, same contract
    # as the keys-map form's prefix sum), so collecting it and folding
    # the offsets back as a literal array lookup keeps the final pass
    # map-only over the checkpointed blocks — no offsets shuffle, no
    # broadcast-join stage. The totals agg stays JVM-side (map-side
    # partial max over the cached blocks; the exchange carries one row
    # per partition).
    totals = {
        r["_pid"]: r["_tot"]
        for r in ranked.groupBy("_pid")
        .agg(F.max("_loc").alias("_tot"))
        .collect()
    }
    n_parts = (max(totals) + 1) if totals else 0
    offs, acc = [], 0
    for p in range(n_parts):
        offs.append(acc)
        acc += totals.get(p, 0)
    off_arr = F.array(*[F.lit(v).cast("long") for v in offs])
    return ranked.select(
        *df.columns,
        (
            F.col("_loc") + F.element_at(off_arr, F.col("_pid") + 1)
        ).cast("long").alias(out_col),
    )


def dense_event_ids_inline(
    facts: DataFrame,
    person_col: str,
    date_col: str,
    families: list[tuple[str, str]],
    episode_families: list[tuple[list[str], str, int]] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach every per-(person, date) dense event-id family DIRECTLY
    to the fact rows in ONE exchange + ONE vectorized pass.

    The reference mints utilization-event ids with un-partitioned
    ``DENSE_RANK() OVER (ORDER BY person, service_date)`` per family
    plus a separate episode ranking
    (``load_stage.apcd_claim_header.R:905-1018``) — a single-task
    funnel on Spark. The round-3 form here (tagged explode + range
    sort + per-claim fold-back) and the keys-map form both pay several
    fact- or keys-grain shuffles and materializations. This form pays
    exactly one:

      1. one range exchange of ``facts`` by PERSON (equal persons
         never straddle partitions), sorted (person, date) in place;
      2. one Arrow-batched pass per partition computing, per family,
         the running count of DISTINCT FLAGGED (person, date) keys —
         dense_rank == count of participating keys at-or-before — and
         per episode family the Yale gap-chain start events, all as
         numpy cumsums with O(1) carried state between record batches;
      3. per-partition totals -> prefix-sum offsets (#partitions
         rows), broadcast back; id = local + offset, masked by the
         ROW's own flag so a non-participating claim on a shared
         service date stays NULL.

    Justification for the Python crossing: Spark SQL cannot express a
    per-physical-partition running aggregate — Window.partitionBy(
    spark_partition_id()) does not recognize the existing range
    partitioning and stacks a second full exchange + sort on top
    (measured in the executed plan). The crossing carries only the
    narrow minting projection (ints + a date), every kernel is
    vectorized, and it replaces two fact-grain shuffles, a window sort
    and a join-back — the bounded-crossing standard set by the BLAS
    block-cosine path.

    ``families``: (flag_col, out_col) — id = dense rank of the row's
    (person, date) key among flagged keys, ordered (person, date).
    ``episode_families``: (member_flag_cols, out_col, merge_gap_days)
    — member keys chain into episodes while consecutive member dates
    are <= gap apart; id is dense over (person, episode_start).
    ``date_col`` AND ``person_col`` must be non-null: claim service
    dates are in every caller, and callers with nullable person keys
    pre-coalesce NULL to a sentinel (the mcaid/mcare/combined builders
    all do; pinned by ``test_dense_event_ids_inline_null_person_
    sentinel``). The batch-boundary carry compares raw key values, so
    an un-coalesced NULL person would compare unequal to itself across
    an Arrow batch split and mint a duplicate id. Equal (person, date)
    rows may arrive in any order within the key — ids are key-level so
    the tiebreak cannot matter.

    Returns ``facts`` (same rows, eagerly checkpointed — see
    ``_eager_checkpoint``) plus one nullable long column per family.
    """
    episode_families = episode_families or []
    flag_names = [flag for flag, _ in families]
    ep_specs = list(episode_families)
    n_fam = len(flag_names)
    n_tot = n_fam + len(ep_specs)
    loc_names = (
        [f"_loc_{out}" for _, out in families]
        + [f"_loc_{out}" for _, out, _ in ep_specs]
    )
    member_exprs = {}
    for i, (members, _, _) in enumerate(ep_specs):
        cond = None
        for m in members:
            c = F.col(m) == 1
            cond = c if cond is None else (cond | c)
        member_exprs[f"_epmem_{i}"] = F.when(cond, 1).otherwise(0)
    prepped = facts.withColumns(member_exprs) if member_exprs else facts
    ep_mem_names = list(member_exprs)

    if num_partitions:
        ranged = prepped.repartitionByRange(num_partitions, person_col)
    else:
        ranged = prepped.repartitionByRange(person_col)
    ranged = ranged.sortWithinPartitions(person_col, date_col)

    fields = ", ".join(
        f"`{name}` {dtype}" for name, dtype in prepped.dtypes
    )
    out_schema = (
        fields + ", `_pid` int, "
        + ", ".join(f"`{c}` long" for c in loc_names)
    )

    def _group_first_flags(flags, key_change, carry_seen):
        """Vectorized: 1 where this row is the FIRST flagged row of its
        (person, date) key, given ``carry_seen`` = whether the key
        continuing from the previous batch was already flagged."""
        import numpy as np

        n = len(flags)
        excl = np.cumsum(flags) - flags  # flagged rows strictly before
        # per-row baseline: flagged rows before this row's KEY started
        starts = np.nonzero(key_change)[0]
        base = np.zeros(n, dtype="int64")
        if len(starts):
            base[starts] = excl[starts]
            np.maximum.accumulate(base, out=base)
        in_key_before = excl - base
        if len(starts) == 0 or starts[0] != 0:
            # leading rows continue the carried key
            lead = slice(0, starts[0] if len(starts) else n)
            in_key_before[lead] += 1 if carry_seen else 0
        first = (flags == 1) & (in_key_before == 0)
        # new carry: is the LAST key of the batch flagged so far?
        if len(starts):
            last_flagged = (excl[-1] + flags[-1] - base[-1]) > 0
        else:
            last_flagged = carry_seen or (excl[-1] + flags[-1]) > 0
        return first.astype("int64"), bool(last_flagged)

    def _running(iterator):
        # mapInArrow, not mapInPandas: the pass-through columns never
        # leave Arrow (zero conversion), person/flag columns view as
        # numpy ints zero-copy, and date32 casts to raw epoch-day
        # int32s so the gap math is integer subtraction
        from pyspark import TaskContext
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        pid = TaskContext.get().partitionId()
        run = np.zeros(n_tot, dtype="int64")
        # explicit has-carry flag (not a None-sentinel on the person
        # value): 'no previous batch yet' and 'previous person was
        # NULL' must not conflate — see the non-null person_col
        # precondition in the docstring
        has_carry = False
        carry_person = None
        carry_date = None
        carry_seen = [False] * n_tot
        # per episode family: (person, day) of the last MEMBER row —
        # the gap chain resets on person change
        last_mem = [(None, None)] * len(ep_specs)
        for batch in iterator:
            m = batch.num_rows
            if m == 0:
                continue
            names = batch.schema.names
            persons = batch.column(
                names.index(person_col)
            ).to_numpy(zero_copy_only=False)
            date_arr = batch.column(names.index(date_col))
            days = pc.cast(date_arr, pa.int32()).to_numpy(
                zero_copy_only=False
            ).astype("int64")
            key_change = np.ones(m, dtype=bool)
            key_change[1:] = (persons[1:] != persons[:-1]) | (
                days[1:] != days[:-1]
            )
            if (
                has_carry
                and persons[0] == carry_person
                and days[0] == carry_date
            ):
                key_change[0] = False
            locs = np.empty((m, n_tot), dtype="int64")
            for j, flag in enumerate(flag_names):
                fl = pc.fill_null(
                    batch.column(names.index(flag)), 0
                ).to_numpy(zero_copy_only=False).astype("int64")
                first, carry_seen[j] = _group_first_flags(
                    fl, key_change, carry_seen[j]
                )
                locs[:, j] = run[j] + np.cumsum(first)
            for gi, (_, _, gap) in enumerate(ep_specs):
                k = n_fam + gi
                mem = batch.column(
                    names.index(ep_mem_names[gi])
                ).to_numpy(zero_copy_only=False).astype("int64")
                first, carry_seen[k] = _group_first_flags(
                    mem, key_change, carry_seen[k]
                )
                midx = np.nonzero(first)[0]
                events = np.zeros(m, dtype="int64")
                if len(midx):
                    dm = days[midx]
                    pm = persons[midx]
                    s = np.empty(len(midx), dtype=bool)
                    s[1:] = (pm[1:] != pm[:-1]) | (
                        (dm[1:] - dm[:-1]) > gap
                    )
                    lp, ld = last_mem[gi]
                    if lp is None or pm[0] != lp:
                        s[0] = True
                    else:
                        s[0] = (dm[0] - ld) > gap
                    events[midx] = s.astype("int64")
                    last_mem[gi] = (pm[-1], dm[-1])
                locs[:, k] = run[k] + np.cumsum(events)
            run = locs[-1, :].copy()
            has_carry = True
            carry_person = persons[-1]
            carry_date = days[-1]
            arrays = list(batch.columns)
            arrays.append(pa.array(np.full(m, pid, dtype="int32")))
            for j in range(n_tot):
                arrays.append(pa.array(locs[:, j]))
            yield pa.RecordBatch.from_arrays(
                arrays, names=names + ["_pid"] + loc_names
            )

    ranked = _eager_checkpoint(ranged.mapInArrow(_running, out_schema))

    # per-partition totals: the running count's last value (monotone,
    # so max == total) -> prefix-sum offsets. One row per physical
    # partition — bounded metadata, so collect it (reading the
    # just-materialized checkpoint blocks, JVM-side partial max) and
    # fold the offsets back as literal array lookups on _pid: the id
    # attachment stays MAP-ONLY over the checkpoint, with no offsets
    # shuffle and no broadcast-join stage (same fold as
    # ``dense_rank_inline``).
    totals = {
        r["_pid"]: [r[f"_tot{c}"] for c in loc_names]
        for r in ranked.groupBy("_pid").agg(*[
            F.max(F.col(c)).alias(f"_tot{c}") for c in loc_names
        ]).collect()
    }
    n_parts = (max(totals) + 1) if totals else 0
    off_arrays = []
    for j in range(n_tot):
        offs, acc = [], 0
        for p in range(n_parts):
            offs.append(acc)
            acc += totals[p][j] if p in totals else 0
        off_arrays.append(
            F.array(*[F.lit(v).cast("long") for v in offs])
        )
    def _off(j):
        return F.element_at(off_arrays[j], F.col("_pid") + 1)
    id_cols = []
    for i, (flag, out) in enumerate(families):
        c = loc_names[i]
        id_cols.append(
            F.when(
                F.col(flag) == 1,
                (F.col(c) + _off(i)).cast("long"),
            ).alias(out)
        )
    for i, (_, out, _) in enumerate(ep_specs):
        c = loc_names[n_fam + i]
        id_cols.append(
            F.when(
                F.col(ep_mem_names[i]) == 1,
                (F.col(c) + _off(n_fam + i)).cast("long"),
            ).alias(out)
        )
    return ranked.select(*facts.columns, *id_cols)
