"""dislib_spark — a PySpark-native analytics/ML engine with the
capabilities of bsc-wdc/dislib (reference: /root/reference, v1.0.1).

Design: the relational algebra is Spark SQL / Catalyst untouched; the
dislib surface (ds-array ops + estimators) is re-expressed Spark-first
(DataFrame + pyspark.ml + pandas UDFs), per SURVEY.md §1.4.

Not a port: dislib's PyCOMPSs block/task machinery (reference
dislib/data/array.py) is replaced by DataFrame partitions and lazy
Catalyst plans.
"""

from dislib_spark.session import get_spark
from dislib_spark.tables import TABLES, load_table, register_views
from dislib_spark.array import (
    DsArray,
    array,
    random_array,
    zeros,
    full,
    identity,
    eye,
    concat_rows,
    concat_columns,
    apply_along_axis,
    kron,
    matmul,
    matmul_sql,
    qr_economic,
    svd,
    transpose,
    ComplexDsArray,
    carray,
    SparseDsArray,
    load_svmlight_sparse,
    DsTensor,
    from_array,
    from_ds_array,
    load_dataset,
    random_tensors,
    pad,
    pad_last_blocks_with_zeros,
    remove_last_columns,
    remove_last_rows,
    exp,
    gammaln,
    log,
    matadd,
    matsubtract,
)
from dislib_spark.sources import (
    load_blocks_rechunk,
    load_mdcrd_file,
    load_npy_file,
    load_svmlight_file,
    load_txt_file,
    save_txt,
)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "register_views",
    "DsArray",
    "array",
    "random_array",
    "zeros",
    "full",
    "identity",
    "eye",
    "concat_rows",
    "concat_columns",
    "apply_along_axis",
    "kron",
    "matmul",
    "matmul_sql",
    "qr_economic",
    "svd",
    "transpose",
    "ComplexDsArray",
    "carray",
    "SparseDsArray",
    "load_svmlight_sparse",
    "DsTensor",
    "from_array",
    "from_ds_array",
    "load_dataset",
    "random_tensors",
    "pad",
    "pad_last_blocks_with_zeros",
    "remove_last_columns",
    "remove_last_rows",
    "exp",
    "gammaln",
    "log",
    "matadd",
    "matsubtract",
    "load_svmlight_file",
    "load_npy_file",
    "load_txt_file",
    "load_blocks_rechunk",
    "load_mdcrd_file",
    "save_txt",
]
