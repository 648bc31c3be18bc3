"""DsArray: distributed 2-D array facade over DataFrame (SURVEY §1.4)."""

from dislib_spark.array.core import (
    DsArray,
    apply_along_axis,
    array,
    concat_columns,
    concat_rows,
    eye,
    full,
    identity,
    random_array,
    zeros,
)
from dislib_spark.array.linalg import (
    kron,
    matmul,
    matmul_sql,
    qr_economic,
    svd,
    transpose,
)
from dislib_spark.array.complexa import (
    ComplexDsArray,
    carray,
    from_parts,
    from_real,
)
from dislib_spark.array.sparse import SparseDsArray, load_svmlight_sparse
from dislib_spark.array.util import (
    pad,
    pad_last_blocks_with_zeros,
    remove_last_columns,
    remove_last_rows,
)
from dislib_spark.array.tensor import (
    DsTensor,
    from_array,
    from_ds_array,
    load_dataset,
    random_tensors,
)

__all__ = [
    "DsArray",
    "apply_along_axis",
    "array",
    "concat_columns",
    "concat_rows",
    "eye",
    "full",
    "identity",
    "random_array",
    "zeros",
    "kron",
    "matmul",
    "matmul_sql",
    "qr_economic",
    "svd",
    "transpose",
    "ComplexDsArray",
    "carray",
    "from_parts",
    "from_real",
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
]
