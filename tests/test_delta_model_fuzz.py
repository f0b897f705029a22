"""Model-based fuzz of the jar-less Delta writer.

A seeded random interleaving of append / DV-or-CoW DELETE / UPDATE /
MERGE / RESTORE / OPTIMIZE / checkpoint+expire / vacuum runs against BOTH
the real table and a trivial in-memory dict model.  After every operation
the snapshot must equal the model, and a randomly chosen HISTORICAL
version must equal the model state recorded when that version was
committed (time travel through every feature interaction, including
reads that replay through a parquet log checkpoint).

This is the cheapest way to catch cross-feature bugs the per-feature
suites miss — the round-6 RESTORE-vs-deletion-vector and
checkpoint-protocol defects were both of exactly this class.
"""

import random

import pytest

# round-13 test tiering: randomized fuzz/stress campaign — slow tier
# (directed tests + the DuckDB oracle gate cover the same operators)
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.maintenance import (
    optimize_delta_table,
    vacuum_delta_table,
)
from polars_incremental_spark.sinks.delta import (
    delete_rows,
    read_table,
    restore_table,
    update_rows,
    write_table,
)
from polars_incremental_spark.sinks.deltalog import (
    checkpoint_log,
    merge_into,
    write_delta_fallback,
)


def _snapshot(spark, path, version=None):
    df = read_table(spark, path, version=version)
    return sorted((r["k"], r["v"]) for r in df.collect())


def _model_rows(model):
    return sorted(model.items())


@pytest.mark.parametrize("seed", [7, 23, 41])
def test_random_dml_interleaving_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"t{seed}")
    model: dict[int, int] = {i: 0 for i in range(20)}
    write_table(
        spark.createDataFrame(list(model.items()), "k long, v long").coalesce(2),
        path,
    )
    log = DeltaLog(path)
    # version -> model snapshot at that version (data-changing commits only;
    # metadata-only commits like checkpoint/vacuum don't create versions)
    history: dict[int, list] = {log.latest_version(): _model_rows(model)}
    next_key = 100
    expired = False  # expire_log drops pre-checkpoint versions from history

    def record():
        history[log.latest_version()] = _model_rows(model)

    for step in range(24):
        op = rng.choice(
            ["append", "delete", "update", "merge", "restore", "optimize",
             "checkpoint", "vacuum"]
        )
        if op == "append":
            n = rng.randint(1, 4)
            rows = [(next_key + i, rng.randint(0, 9)) for i in range(n)]
            next_key += n
            write_delta_fallback(
                spark.createDataFrame(rows, "k long, v long"), path, mode="append"
            )
            model.update(dict(rows))
            record()
        elif op == "delete":
            lo = rng.choice(sorted(model) or [0])
            dv = rng.choice([0, 100])
            res = delete_rows(
                spark, path, f"k >= {lo} AND k < {lo + 5}",
                write_cdf=rng.random() < 0.5, dv_max_rows_per_file=dv,
            )
            for k in [k for k in model if lo <= k < lo + 5]:
                del model[k]
            if res["version"] is not None:
                record()
        elif op == "update":
            m = rng.randint(2, 5)
            update_rows(
                spark, path, f"k % {m} = 0", {"v": f"v + {m}"},
                write_cdf=rng.random() < 0.5,
            )
            for k in model:
                if k % m == 0:
                    model[k] += m
            record()
        elif op == "merge":
            keys = rng.sample(sorted(model), k=min(3, len(model))) if model else []
            src = [(k, rng.randint(50, 59)) for k in keys] + [
                (next_key, rng.randint(50, 59))
            ]
            next_key += 1
            merge_into(
                spark,
                path,
                spark.createDataFrame(src, "k long, v long"),
                keys=["k"],
                when_matched_update={"v": "src.v"},
                when_not_matched_insert=True,
            )
            model.update(dict(src))
            record()
        elif op == "restore":
            candidates = sorted(history)
            target = rng.choice(candidates)
            try:
                restore_table(path, version=target)
            except ValueError:
                assert expired, "restore refused with full history present"
                continue
            model = dict(history[target])
            record()
        elif op == "optimize":
            optimize_delta_table(spark, path, target_partitions=2)
            # dataChange=false commit: snapshot unchanged, new version
            record()
        elif op == "checkpoint":
            checkpoint_log(path)
            if rng.random() < 0.5:
                from polars_incremental_spark.sinks.deltalog import expire_log

                expire_log(path)
                expired = True
                cv = DeltaLog(path).checkpoint_version()
                for v in [v for v in history if v < cv]:
                    del history[v]
        elif op == "vacuum":
            vacuum_delta_table(spark, path, retention_hours=1e6)

        got = _snapshot(spark, path)
        assert got == _model_rows(model), f"seed={seed} step={step} op={op}"
        # time-travel spot check against the recorded history
        probe = rng.choice(sorted(history))
        assert _snapshot(spark, path, version=probe) == history[probe], (
            f"seed={seed} step={step} time-travel to v{probe} after {op}"
        )

    # final: full history agreement on every surviving version
    for v, want in history.items():
        assert _snapshot(spark, path, version=v) == want, f"final v{v}"


def _cdc_rows_for_version(spark, path, version):
    log = DeltaLog(path)
    out = []
    for action in log.actions(version):
        if "cdc" in action:
            for r in spark.read.parquet(log.abs_path(action["cdc"]["path"])).collect():
                out.append((r["k"], r["v"], r["_change_type"]))
    return sorted(out)


@pytest.mark.parametrize("seed", [5, 17])
def test_random_dml_change_feed_matches_model_diffs(spark, tmp_path, seed):
    """Every CDF-writing operation's change files must equal the model's
    before/after diff — deletes list the removed rows, updates list exact
    pre+post images, merges list pre/post/insert."""
    rng = random.Random(seed)
    path = str(tmp_path / f"c{seed}")
    model: dict[int, int] = {i: i % 7 for i in range(15)}
    write_table(
        spark.createDataFrame(list(model.items()), "k long, v long").coalesce(2),
        path,
    )
    log = DeltaLog(path)
    next_key = 100
    for step in range(14):
        op = rng.choice(["append", "delete", "update", "merge"])
        expected = None
        prev_version = log.latest_version()
        if op == "append":
            rows = [(next_key, rng.randint(0, 9))]
            next_key += 1
            write_delta_fallback(
                spark.createDataFrame(rows, "k long, v long"), path, mode="append"
            )
            model.update(dict(rows))
        elif op == "delete":
            lo = rng.choice(sorted(model) or [0])
            res = delete_rows(
                spark, path, f"k >= {lo} AND k < {lo + 4}",
                write_cdf=True, dv_max_rows_per_file=rng.choice([0, 100]),
            )
            gone = {k: v for k, v in model.items() if lo <= k < lo + 4}
            for k in gone:
                del model[k]
            expected = sorted((k, v, "delete") for k, v in gone.items())
            if res["version"] is None:
                assert expected == []
                continue
        elif op == "update":
            m = rng.randint(2, 5)
            # SET touches the predicate column's own source — the round-6
            # postimage regression class
            update_rows(
                spark, path, f"v % {m} = 0", {"v": f"v + {m}"}, write_cdf=True
            )
            hit = {k: v for k, v in model.items() if v % m == 0}
            expected = sorted(
                [(k, v, "update_preimage") for k, v in hit.items()]
                + [(k, v + m, "update_postimage") for k, v in hit.items()]
            )
            for k in hit:
                model[k] += m
        elif op == "merge":
            keys = rng.sample(sorted(model), k=min(2, len(model))) if model else []
            src = [(k, rng.randint(70, 79)) for k in keys] + [
                (next_key, rng.randint(70, 79))
            ]
            next_key += 1
            merge_into(
                spark,
                path,
                spark.createDataFrame(src, "k long, v long"),
                keys=["k"],
                when_matched_update={"v": "src.v"},
                when_not_matched_insert=True,
                write_cdf=True,
            )
            pre = [(k, model[k], "update_preimage") for k, _ in src if k in model]
            post = [(k, nv, "update_postimage") for k, nv in src if k in model]
            ins = [(k, nv, "insert") for k, nv in src if k not in model]
            expected = sorted(pre + post + ins)
            model.update(dict(src))

        v = log.latest_version()
        if expected is not None:
            if v == prev_version:
                # a no-hit UPDATE/MERGE commits nothing: no new version,
                # and nothing must have been expected of it
                assert expected == [], f"seed={seed} step={step} op={op}"
            else:
                got = _cdc_rows_for_version(spark, path, v)
                assert got == expected, f"seed={seed} step={step} op={op} v={v}"
        # and the snapshot still matches
        assert _snapshot(spark, path) == _model_rows(model), (
            f"seed={seed} step={step} op={op}"
        )


@pytest.mark.parametrize("seed", [9])
def test_random_dml_on_partitioned_table(spark, tmp_path, seed):
    """Same model fuzz over a HIVE-PARTITIONED table: DML must respect
    partition pruning, rewrite rows into the right col=value/ dirs when an
    UPDATE moves them across partitions, and keep time travel exact."""
    rng = random.Random(seed)
    path = str(tmp_path / f"p{seed}")
    model: dict[int, tuple[int, int]] = {i: (i % 3, 0) for i in range(18)}

    def df_of(rows):
        return spark.createDataFrame(
            [(k, b, v) for k, (b, v) in rows.items()], "k long, bucket int, v long"
        )

    write_table(df_of(model), path, partition_by=["bucket"])
    log = DeltaLog(path)
    history = {log.latest_version(): sorted(model.items())}
    next_key = 50

    def snap(version=None):
        df = read_table(spark, path, version=version)
        return sorted((r["k"], (r["bucket"], r["v"])) for r in df.collect())

    for step in range(14):
        op = rng.choice(["append", "delete", "update", "move", "optimize"])
        if op == "append":
            rows = {next_key + i: (rng.randint(0, 2), rng.randint(0, 9)) for i in range(2)}
            next_key += 2
            write_delta_fallback(df_of(rows), path, mode="append", partition_by=["bucket"])
            model.update(rows)
        elif op == "delete":
            b = rng.randint(0, 2)
            delete_rows(spark, path, f"bucket = {b} AND k % 2 = 0")
            for k in [k for k, (bb, _) in model.items() if bb == b and k % 2 == 0]:
                del model[k]
        elif op == "update":
            m = rng.randint(2, 4)
            update_rows(spark, path, f"k % {m} = 1", {"v": "v + 10"})
            for k, (b, v) in list(model.items()):
                if k % m == 1:
                    model[k] = (b, v + 10)
        elif op == "move":
            # cross-partition UPDATE: rows must land in their new hive dir
            src_b = rng.randint(0, 2)
            dst_b = (src_b + 1) % 3
            update_rows(spark, path, f"bucket = {src_b} AND k % 5 = 0", {"bucket": str(dst_b)})
            for k, (b, v) in list(model.items()):
                if b == src_b and k % 5 == 0:
                    model[k] = (dst_b, v)
        elif op == "optimize":
            optimize_delta_table(spark, path, target_partitions=1)
        history[log.latest_version()] = sorted(model.items())
        assert snap() == sorted(model.items()), f"seed={seed} step={step} op={op}"
        # partitionValues stay truthful: every add's hive value matches its rows
        for a in log.snapshot_files(log.latest_version()):
            pv = a.get("partitionValues") or {}
            assert "bucket" in pv, f"missing partitionValues after {op}"
        probe = rng.choice(sorted(history))
        assert snap(version=probe) == history[probe], f"time travel v{probe} after {op}"


@pytest.mark.parametrize("seed", [37])
def test_random_constraint_lifecycle_with_restore(spark, tmp_path, seed):
    """Constraints enter and leave via ALTER and via RESTORE (which reverts
    the FULL metadata — the round-6 fix): a violating append must be
    rejected with zero log growth exactly when a constraint is live in the
    model, and accepted otherwise."""
    from polars_incremental_spark.errors import ConstraintViolationError
    from polars_incremental_spark.sinks.deltalog import (
        add_check_constraint,
        drop_check_constraint,
    )

    rng = random.Random(seed)
    path = str(tmp_path / "t")
    write_table(spark.range(5).selectExpr("id AS k", "CAST(5 AS LONG) AS v"), path)
    log = DeltaLog(path)
    live: set[str] = set()
    # version -> constraint set at that version
    cons_hist = {log.latest_version(): frozenset()}
    n_rows = 5

    for step in range(16):
        op = rng.choice(["append_ok", "append_bad", "add", "drop", "restore"])
        before = log.latest_version()
        if op == "append_ok":
            write_delta_fallback(
                spark.createDataFrame([(100 + step, 1)], "k long, v long"),
                path, mode="append",
            )
            n_rows += 1
            cons_hist[log.latest_version()] = frozenset(live)
        elif op == "append_bad":
            # v = -1 violates v_pos when live; when NOT live it lands in
            # the table and must block a LATER ALTER ADD (existing-data
            # validation) until a restore reverts it
            try:
                write_delta_fallback(
                    spark.createDataFrame([(200 + step, -1)], "k long, v long"),
                    path, mode="append",
                )
                assert "v_pos" not in live, f"violating append accepted, step={step}"
                n_rows += 1
                cons_hist[log.latest_version()] = frozenset(live)
            except ConstraintViolationError:
                assert "v_pos" in live, f"valid append rejected, step={step}"
                assert log.latest_version() == before, "rejected append grew the log"
        elif op == "add":
            if "v_pos" in live:
                continue
            has_bad = read_table(spark, path).filter("v <= 0").count() > 0
            try:
                add_check_constraint(spark, path, "v_pos", "v > 0")
                assert not has_bad, f"ALTER ADD accepted over violating rows, step={step}"
                live.add("v_pos")
                cons_hist[log.latest_version()] = frozenset(live)
            except ConstraintViolationError:
                # existing-data validation: correct iff a bad row is present
                assert has_bad, f"ALTER ADD rejected a clean table, step={step}"
                assert log.latest_version() == before, "rejected ADD grew the log"
        elif op == "drop":
            if "v_pos" not in live:
                continue
            drop_check_constraint(path, "v_pos")
            live.discard("v_pos")
            cons_hist[log.latest_version()] = frozenset(live)
        elif op == "restore":
            target = rng.choice(sorted(cons_hist))
            restore_table(path, version=target)
            live = set(cons_hist[target])
            # data also reverts; recompute row count from the table
            n_rows = read_table(spark, path).count()
            cons_hist[log.latest_version()] = frozenset(live)

        # the live constraint set must round-trip through the log
        cfg = (log.table_metadata() or {}).get("configuration") or {}
        got = {k.split(".")[-1] for k in cfg if k.startswith("delta.constraints.")}
        assert got == live, f"step={step} op={op}: log says {got}, model {live}"
        assert read_table(spark, path).count() == n_rows


@pytest.mark.parametrize("seed", [11, 29])
def test_random_column_mapping_lifecycle(spark, tmp_path, seed):
    """Interleave appends / DML / RENAME COLUMN / DROP COLUMN / optimize /
    checkpoint+expire on a column-mapped table.  The model tracks the
    rows AND the logical column names per version: every snapshot must
    read under the CURRENT logical names, and time travel must show the
    names as of that version (renames are metadata-only, so historical
    reads replay the old schema against the same physical files)."""
    from polars_incremental_spark.sinks.deltalog import (
        drop_column,
        enable_column_mapping,
        expire_log,
        rename_column,
    )

    rng = random.Random(seed)
    path = str(tmp_path / f"cm{seed}")
    model: dict[int, tuple[int, int]] = {i: (i * 2, i % 3) for i in range(20)}
    vname, have_w = "v", True
    write_table(
        spark.createDataFrame(
            [(k, v, w) for k, (v, w) in model.items()], "k long, v long, w int"
        ).coalesce(2),
        path,
    )
    enable_column_mapping(path)
    log = DeltaLog(path)

    def rows_now():
        df = read_table(spark, path)
        cols = ["k", vname] + (["w"] if have_w else [])
        assert sorted(df.columns) == sorted(cols), (vname, have_w, df.columns)
        out = []
        for r in df.collect():
            out.append((r["k"], r[vname], r["w"] if have_w else None))
        return sorted(out)

    def model_rows():
        return sorted(
            (k, v, w if have_w else None) for k, (v, w) in model.items()
        )

    # version -> (vname, have_w, rows)
    history = {log.latest_version(): (vname, have_w, model_rows())}
    next_key, renames, expired = 100, 0, False

    def record():
        history[log.latest_version()] = (vname, have_w, model_rows())

    for step in range(20):
        op = rng.choice(
            ["append", "delete", "update", "rename", "drop_w", "optimize",
             "checkpoint"]
        )
        if op == "append":
            n = rng.randint(1, 3)
            rows = [
                (next_key + i, rng.randint(0, 9), rng.randint(0, 2))
                for i in range(n)
            ]
            next_key += n
            cols = f"k long, {vname} long" + (", w int" if have_w else "")
            data = [r if have_w else r[:2] for r in rows]
            write_delta_fallback(spark.createDataFrame(data, cols), path)
            model.update({r[0]: (r[1], r[2] if have_w else None) for r in rows})
            record()
        elif op == "delete":
            lo = rng.choice(sorted(model))
            res = delete_rows(spark, path, f"k >= {lo} AND k < {lo + 4}")
            for k in [k for k in model if lo <= k < lo + 4]:
                del model[k]
            if res["version"] is not None:
                record()
        elif op == "update":
            m = rng.randint(2, 4)
            update_rows(spark, path, f"k % {m} = 1", {vname: f"{vname} + 100"})
            model.update(
                {
                    k: (v + 100, w)
                    for k, (v, w) in model.items()
                    if k % m == 1
                }
            )
            record()
        elif op == "rename":
            renames += 1
            new = f"v{renames}"
            rename_column(path, vname, new)
            vname = new
            record()
        elif op == "drop_w" and have_w:
            drop_column(path, "w")
            have_w = False
            record()
        elif op == "optimize":
            optimize_delta_table(spark, path, target_partitions=2)
            record()
        elif op == "checkpoint":
            checkpoint_log(path)
            if rng.random() < 0.5:
                expire_log(path)
                expired = True
                cv = DeltaLog(path).checkpoint_version()
                for v in [v for v in history if v < cv]:
                    del history[v]

        assert rows_now() == model_rows(), f"seed={seed} step={step} op={op}"
        # time travel: the schema (logical names!) must be as of the probe
        probe = rng.choice(sorted(history))
        pv, pw, prows = history[probe]
        old = read_table(spark, path, version=probe)
        assert pv in old.columns and ("w" in old.columns) == pw, (
            f"seed={seed} v{probe}: {old.columns} want {pv}, w={pw}"
        )
        got_old = sorted(
            (r["k"], r[pv], r["w"] if pw else None) for r in old.collect()
        )
        assert got_old == prows, f"seed={seed} time travel v{probe} after {op}"

    assert renames > 0 or seed != 11  # the interleaving actually exercised renames


@pytest.mark.parametrize("seed", [5, 19])
def test_random_row_tracking_lifecycle(spark, tmp_path, seed):
    """Row-id STABILITY under a random append / DV-delete / checkpoint+
    expire / clone / refused-CoW interleaving: after every op the
    (row_id -> row) mapping must equal the model, ids must never be
    reused, and the domain watermark must stay >= the max live id.
    Half the seeds create the table tracked; the other half enable
    mid-stream and exercise the backfill path."""
    from polars_incremental_spark.sinks.deltalog import (
        clone_table,
        delete_where,
        enable_row_tracking,
        expire_log,
        read_delta_fallback,
        set_table_properties,
        update_where,
    )

    rng = random.Random(seed)
    path = str(tmp_path / f"rt{seed}")
    nxt_k = [0]

    def batch(n):
        rows = [(nxt_k[0] + i, rng.randint(0, 99)) for i in range(n)]
        nxt_k[0] += n
        return spark.createDataFrame(rows, "k long, v long").coalesce(
            rng.randint(1, 3)
        )

    start_tracked = seed % 2 == 1
    write_delta_fallback(batch(10), path, row_tracking=start_tracked)
    if not start_tracked:
        write_delta_fallback(batch(5), path, mode="append")
        enable_row_tracking(path)
    set_table_properties(path, {"delta.enableDeletionVectors": "true"})

    def id_map():
        return {
            r["_row_id"]: (r["k"], r["v"])
            for r in read_delta_fallback(spark, path, row_ids=True).collect()
        }

    def hwm():
        import json as _json

        raw = DeltaLog(path).domain_metadata()["delta.rowTracking"]
        return _json.loads(raw)["rowIdHighWaterMark"]

    model = id_map()  # trust the initial read once; everything after is modeled
    assert len(model) == (10 if start_tracked else 15)
    ever_allocated = set(model)

    for step in range(12):
        op = rng.choice(
            [
                "append",
                "dv_delete",
                "cow_delete",
                "cow_update",
                "merge_update",
                "checkpoint",
                "clone",
                "optimize",
            ]
        )
        if op == "optimize":
            from polars_incremental_spark.sinks.deltalog import compact_fallback

            compact_fallback(spark, path)  # must preserve every id
        elif op == "append":
            n = rng.randint(1, 6)
            base = hwm()
            write_delta_fallback(batch(n), path, mode="append")
            got = id_map()
            new_ids = set(got) - set(model)
            assert new_ids == set(range(base + 1, base + 1 + n)), (
                f"seed={seed} step={step}: fresh ids not the contiguous "
                f"block past the watermark"
            )
            assert not (new_ids & ever_allocated), "row id REUSED"
            ever_allocated |= new_ids
            model = got  # old entries asserted below
        elif op in ("dv_delete", "cow_delete"):
            ks = [k for k, _ in model.values()]
            if not ks:
                continue
            victim = rng.choice(ks)
            # cow_delete forces the rewrite route: survivors' ids must
            # materialize into the fresh files
            delete_where(
                spark,
                path,
                f"k = {victim}",
                dv_max_rows_per_file=0 if op == "cow_delete" else None,
            )
            model = {
                rid: kv for rid, kv in model.items() if kv[0] != victim
            }
        elif op == "cow_update":
            ks = [k for k, _ in model.values()]
            if not ks:
                continue
            victim = rng.choice(ks)
            update_where(spark, path, f"k = {victim}", {"v": "v + 1000"})
            model = {
                rid: (k, v + 1000 if k == victim else v)
                for rid, (k, v) in model.items()
            }
        elif op == "merge_update":
            from polars_incremental_spark.sinks.deltalog import merge_into

            ks = [k for k, _ in model.values()]
            if not ks:
                continue
            victim = rng.choice(ks)
            src = spark.createDataFrame([(victim, 7777)], "k long, v long")
            merge_into(
                spark,
                path,
                src,
                keys=["k"],
                when_matched_update={"v": "src.v"},
                when_not_matched_insert=False,
            )
            model = {
                rid: (k, 7777 if k == victim else v)
                for rid, (k, v) in model.items()
            }
        elif op == "checkpoint":
            checkpoint_log(path, parts=rng.choice([None, 2, 3]))
            if rng.random() < 0.5:
                expire_log(path)
        elif op == "clone":
            tgt = str(tmp_path / f"clone{seed}_{step}")
            clone_table(path, tgt)
            n = rng.randint(1, 3)
            src_hwm = hwm()
            write_delta_fallback(batch(n), tgt, mode="append")
            clone_ids = {
                r["_row_id"]
                for r in read_delta_fallback(spark, tgt, row_ids=True).collect()
            }
            # the clone's fresh ids start past the SOURCE watermark it
            # inherited — no collision with the ids it references
            assert clone_ids == set(model) | set(
                range(src_hwm + 1, src_hwm + 1 + n)
            ), f"seed={seed} step={step}: clone id collision"

        got = id_map()
        assert got == model, f"seed={seed} step={step} op={op}"
        assert hwm() >= (max(ever_allocated) if ever_allocated else -1)
