from dislib_spark.sources.io import (
    load_blocks_rechunk, load_hstack_npy_files, load_mdcrd_file, load_npy_file, load_npy_files,
    load_parquet, load_svmlight_file, load_txt_file, save_parquet, save_txt,
)

__all__ = [
    "load_blocks_rechunk", "load_hstack_npy_files", "load_mdcrd_file", "load_npy_file",
    "load_npy_files", "load_parquet", "load_svmlight_file",
    "load_txt_file", "save_parquet", "save_txt",
]
