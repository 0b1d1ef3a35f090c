"""String scalar functions from the reference's utility layer (SURVEY §2.8).

All pure column expressions (whole-stage codegen, shuffle-free), each with a
DuckDB-expressible twin used by the oracle contract:

- op code: ``Create`` → ``c`` (AvroDataBuilder.java:117,147,193)
- ``.tar`` suffix strip (PartitionWriterManager.java:128,134;
  TiDBCompareByFile.java:90)
- binlog filename number extract, pattern ``(mysql-bin\\.)(\\d+)``
  (BinLogFileUtil / binlog.properties:64; AliBinLogFileTransfer.java:162)
- Hive partition path build/parse ``p_y=…/p_m=…/p_d=…``
  (PartitionUtility.java:19-59)
- key split identity parsing (Binlog.java:56-62; DBbiz.java:97-102)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BINLOG_FILE_RE = r"(mysql-bin\.)(\d+)"


def op_code(op: Column) -> Column:
    """``Create``/``Update``/``Delete`` → ``c``/``u``/``d``."""
    return F.lower(F.substring(op, 1, 2).substr(1, 1))


def strip_tar(name: Column) -> Column:
    return F.regexp_replace(name, r"\.tar$", "")


def binlog_file_num(name: Column) -> Column:
    """``mysql-bin.000123`` → 123 (bigint); no match → NULL."""
    s = F.regexp_extract(name, BINLOG_FILE_RE, 2)
    return F.when(s != "", s.cast("bigint"))


def hive_partition_path(ts: Column) -> Column:
    """timestamp → ``p_y=YYYY/p_m=MM/p_d=DD`` (PartitionUtility.java:19-38)."""
    return F.concat(
        F.lit("p_y="), F.date_format(ts, "yyyy"),
        F.lit("/p_m="), F.date_format(ts, "MM"),
        F.lit("/p_d="), F.date_format(ts, "dd"),
    )


def parse_hive_partition(path: Column) -> Column:
    """``p_y=…/p_m=…/p_d=…`` → date (PartitionUtility.java:40-59)."""
    return F.to_date(
        F.concat_ws(
            "-",
            F.regexp_extract(path, r"p_y=(\d+)", 1),
            F.regexp_extract(path, r"p_m=(\d+)", 1),
            F.regexp_extract(path, r"p_d=(\d+)", 1),
        )
    )


def split_key(key: Column, idx: int, sep: str = "_") -> Column:
    """1-based element of a ``_``-separated identity key (Binlog.java:56-62)."""
    return F.element_at(F.split(key, sep), idx)
