"""Randomized rename/drop lifecycle property (round 15): a SEEDED
random sequence of append / rename / add / drop / update / delete
verbs against an in-memory row model — after EVERY verb the table
reads back exactly the model, on BOTH formats.  This is the
column-mapping twin of the r14 stream-equals-batch verb property:
whatever interleaving of schema changes and DML the generator picks,
the physical/historical name resolution must never leak a stale name,
a null, or a dropped column's bytes.
"""

from __future__ import annotations

import random

import pytest

from hainan_big_data_recommend_system_spark.sources import (
    delta_sink,
    iceberg_sink,
)

N_OPS = 10
SEEDS = [7, 1131, 20260817]


class _Model:
    """Rows keyed by stable internal column keys; a name map carries
    the CURRENT logical name per key (renames move only the name)."""

    def __init__(self):
        self.cols: list[str] = ["k0", "k1", "k2"]  # internal keys
        self.names = {"k0": "id", "k1": "c1", "k2": "c2"}
        self.rows: list[dict] = []
        self.next_id = 0
        self.next_col = 3

    def schema(self) -> str:
        return ", ".join(f"{self.names[k]} long" for k in self.cols)

    def append_rows(self, n: int, rng) -> list[tuple]:
        out = []
        for _ in range(n):
            row = {k: (self.next_id if k == "k0"
                       else rng.randrange(100)) for k in self.cols}
            self.next_id += 1
            self.rows.append(row)
            out.append(tuple(row[k] for k in self.cols))
        return out

    def expected(self) -> list[tuple]:
        return sorted(
            tuple(r.get(k) for k in self.cols) for r in self.rows
        )


def _read(spark, fmt, tbl, model):
    if fmt == "delta":
        df = delta_sink.read_delta_table(spark, tbl)
    else:
        df = iceberg_sink.read_iceberg_table(spark, tbl)
    want_cols = [model.names[k] for k in model.cols]
    assert df.columns == want_cols, (df.columns, want_cols)
    return sorted(tuple(r) for r in df.select(*want_cols).collect())


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_random_lifecycle_matches_model(spark, tmp_path, fmt, seed):
    rng = random.Random(seed)
    model = _Model()
    tbl = str(tmp_path / f"t-{fmt}-{seed}")
    first = model.append_rows(3, rng)
    df = spark.createDataFrame(first, model.schema())
    if fmt == "delta":
        delta_sink.write_delta(df, tbl)
        delta_sink.enable_column_mapping_delta(tbl)
    else:
        iceberg_sink.write_iceberg(df, tbl)

    for step in range(N_OPS):
        op = rng.choice(["append", "rename", "add", "drop",
                         "update", "delete"])
        data_keys = [k for k in model.cols if k != "k0"]
        if op == "append":
            rows = model.append_rows(rng.randrange(1, 4), rng)
            df = spark.createDataFrame(rows, model.schema())
            if fmt == "delta":
                delta_sink.write_delta(df, tbl)
            else:
                iceberg_sink.write_iceberg(df, tbl)
        elif op == "rename":
            key = rng.choice(data_keys)
            new = f"c{model.next_col}"
            model.next_col += 1
            if fmt == "delta":
                delta_sink.rename_columns_delta(
                    tbl, {model.names[key]: new})
            else:
                iceberg_sink.rename_columns_iceberg(
                    tbl, {model.names[key]: new})
            model.names[key] = new
        elif op == "add":
            key = f"k{model.next_col}"
            new = f"c{model.next_col}"
            model.next_col += 1
            if fmt == "delta":
                delta_sink.add_columns_delta(tbl, {new: "bigint"})
            else:
                iceberg_sink.add_columns_iceberg(tbl, {new: "bigint"})
            model.cols.append(key)
            model.names[key] = new
        elif op == "drop":
            if len(data_keys) < 2:
                continue  # keep at least one data column around
            key = rng.choice(data_keys)
            if fmt == "delta":
                delta_sink.drop_columns_delta(tbl,
                                              [model.names[key]])
            else:
                iceberg_sink.drop_columns_iceberg(
                    tbl, [model.names[key]])
            model.cols.remove(key)
            del model.names[key]
        elif op == "update":
            if not data_keys:
                continue
            key = rng.choice(data_keys)
            mod, val = rng.randrange(2, 5), rng.randrange(1000)
            cond = f"id % {mod} = 0"
            if fmt == "delta":
                delta_sink.update_where_delta(
                    spark, tbl, cond, {model.names[key]: str(val)})
            else:
                iceberg_sink.update_where_iceberg(
                    spark, tbl, cond, {model.names[key]: str(val)})
            for r in model.rows:
                if r["k0"] % mod == 0:
                    r[key] = val
        else:  # delete
            mod, rem = rng.randrange(3, 6), rng.randrange(3)
            cond = f"id % {mod} = {rem}"
            if fmt == "delta":
                delta_sink.delete_where_delta(spark, tbl, cond)
            else:
                iceberg_sink.delete_where_iceberg(spark, tbl, cond)
            model.rows = [r for r in model.rows
                          if r["k0"] % mod != rem]
        got = _read(spark, fmt, tbl, model)
        assert got == model.expected(), (
            f"step {step} op {op} (fmt {fmt}, seed {seed})"
        )
