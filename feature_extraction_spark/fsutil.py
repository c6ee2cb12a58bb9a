"""Hadoop FileSystem helpers (driver-side metadata IO).

On a 100 TB deployment checkpoints/snapshots live on the cluster store
(HDFS/S3), where os.listdir sees nothing — every filesystem touch in the
engine goes through the Hadoop FS API so file://, hdfs://, s3a:// all work
identically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the Hadoop FS API."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def fs_list_parquet(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """[(file_name, bytes)] of the part files under ``path``."""
    fs, jpath = hadoop_fs(spark, path)
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            out.append((name, int(st.getLen())))
    return sorted(out)


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, jpath = hadoop_fs(spark, path)
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def fs_read_text(spark: SparkSession, path: str) -> str:
    # NB: a java byte[] buffer passed from Python is copied, not shared —
    # read(buf) would fill the Java copy only. commons-io (bundled with
    # Hadoop) drains the stream JVM-side and returns the bytes.
    fs, jpath = hadoop_fs(spark, path)
    stream = fs.open(jpath)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()
