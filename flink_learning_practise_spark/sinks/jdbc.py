"""JDBC/MySQL sink — Spark analog of the reference's
``flink_sink_utils.py:190`` create_mysql_sink / ``:358``
create_mysql_table_sink_ddl and ``flink5_process_and_sink_jdbc.py``.

Two paths:
- :func:`write_jdbc_batch` — plain ``df.write.jdbc`` append (driver jar
  required on the classpath).
- :func:`upsert_batch_fn` — builds a ``foreachBatch`` function that
  upserts by primary key (INSERT ... ON DUPLICATE KEY UPDATE for MySQL,
  ON CONFLICT for PostgreSQL). Idempotent ⇒ streaming exactly-once under
  micro-batch replay.

SQL text is built with identifier quoting + parameter placeholders; the
rows travel through executemany, never string interpolation (the
reference escapes values by hand — flink_sink_utils.py:401).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def write_jdbc_batch(
    df: DataFrame, url: str, table: str, mode: str = "append", **properties: str
) -> None:
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def build_upsert_sql(
    table: str, columns: list[str], key_columns: list[str], dialect: str = "mysql"
) -> str:
    """Parameterized upsert statement for executemany."""
    cols = ", ".join(f"`{c}`" if dialect == "mysql" else f'"{c}"' for c in columns)
    placeholders = ", ".join(["%s"] * len(columns))
    non_keys = [c for c in columns if c not in key_columns]
    if dialect == "mysql":
        updates = ", ".join(f"`{c}` = VALUES(`{c}`)" for c in non_keys)
        return (
            f"INSERT INTO `{table}` ({cols}) VALUES ({placeholders}) "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    if dialect == "postgresql":
        keys = ", ".join(f'"{c}"' for c in key_columns)
        updates = ", ".join(f'"{c}" = EXCLUDED."{c}"' for c in non_keys)
        return (
            f'INSERT INTO "{table}" ({cols}) VALUES ({placeholders}) '
            f"ON CONFLICT ({keys}) DO UPDATE SET {updates}"
        )
    raise ValueError(f"unsupported dialect {dialect!r}")


def upsert_batch_fn(
    table: str,
    key_columns: list[str],
    connection_factory: Callable[[], object],
    dialect: str = "mysql",
    batch_size: int = 1000,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function performing chunked executemany upserts.

    ``connection_factory`` returns a DB-API connection (e.g. a pooled
    pymysql connect); it is called once per partition ON THE EXECUTOR,
    so the factory must be picklable and must not capture a live
    connection. Per-partition writes keep the driver out of the data
    path (a driver-side collect would cap throughput at one node).
    """

    def _write_partition(rows_iter, columns: list[str]) -> None:
        sql = build_upsert_sql(table, columns, key_columns, dialect)
        conn = connection_factory()
        try:
            cur = conn.cursor()
            buf: list[tuple] = []
            for row in rows_iter:
                buf.append(tuple(row[c] for c in columns))
                if len(buf) >= batch_size:
                    cur.executemany(sql, buf)
                    buf.clear()
            if buf:
                cur.executemany(sql, buf)
            conn.commit()
        finally:
            conn.close()

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        columns = list(batch_df.columns)
        batch_df.foreachPartition(lambda it: _write_partition(it, columns))

    return batch_fn
