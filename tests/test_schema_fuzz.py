"""Randomized schema-evolution fuzz: waves of files whose schemas drift
(columns appear in random order, types widen, columns go missing) flow
through a checkpointed Pipeline under add_new_columns + type_widen; the
accumulated output must contain every landed row with every value either
preserved exactly or NULL-filled for pre-evolution rows — never a wrong
value, never a lost/duplicated row, and the final schema must be the
union under the widening lattice regardless of arrival order.
"""

import random

import pytest

# round-13 test tiering: randomized fuzz/stress campaign — slow tier
# (directed tests + the DuckDB oracle gate cover the same operators)
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from polars_incremental_spark import FilesSource, Pipeline
from polars_incremental_spark.schema import SchemaEvolution

COLS = [
    ("a", "long"),
    ("b", "double"),
    ("c", "string"),
    ("d", "int"),  # widens into b-like slots when drawn as long later
]


@pytest.mark.parametrize("seed", [13, 31])
def test_drifting_file_schemas_accumulate_loss_free(spark, tmp_path, seed):
    rng = random.Random(seed)
    land = str(tmp_path / "land")
    cp = str(tmp_path / "cp")

    expected: dict[int, dict] = {}
    next_id = 0

    def land_wave(wave):
        nonlocal next_id
        # pick a random subset of extra columns, random order
        extras = rng.sample(COLS, k=rng.randint(0, len(COLS)))
        rng.shuffle(extras)
        n = rng.randint(1, 6)
        rows, data = [], []
        for _ in range(n):
            row = {"id": next_id}
            vals = [next_id]
            for name, typ in extras:
                if typ == "long":
                    v = rng.randint(-5, 5)
                elif typ == "double":
                    v = round(rng.uniform(-2, 2), 3)
                elif typ == "int":
                    v = rng.randint(0, 99)
                else:
                    v = rng.choice(["x", "y", "z"])
                row[name] = v
                vals.append(v)
            expected[next_id] = row
            rows.append(tuple(vals))
            next_id += 1
        ddl = ", ".join(["id long"] + [f"{n} {t}" for n, t in extras])
        spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(
            f"{land}/wave_{wave}"
        )

    collected: list[dict] = []

    def writer(df, batch_id):
        collected.extend(r.asDict() for r in df.collect())

    pipe = Pipeline(
        source=FilesSource(path=land),
        checkpoint_dir=cp,
        writer=writer,
        schema_evolution=SchemaEvolution(mode="type_widen"),
    )

    for wave in range(6):
        land_wave(wave)
        pipe.run(spark)

    assert len(collected) == len(expected), "row count drifted"
    for got in collected:
        want = expected[got["id"]]
        for col, val in got.items():
            if col == "id":
                continue
            if col in want:
                if isinstance(want[col], float):
                    assert abs(val - want[col]) < 1e-9, (got, want)
                else:
                    # widening may change the Python type (int -> float)
                    assert val == want[col], (got, want)
            else:
                assert val is None, f"phantom value {col}={val} for {got}"
