from bcm3_tpu.io.output import NC_FILL_DOUBLE, SampleHandlerHDF5, load_results
from bcm3_tpu.io.bundler import HDF5Bundler, write_adaptation_dump
from bcm3_tpu.io.config import (
    build_arg_parser,
    load_options,
    options_from_args,
    pt_config_from_options,
)

__all__ = [
    "NC_FILL_DOUBLE",
    "SampleHandlerHDF5",
    "load_results",
    "HDF5Bundler",
    "write_adaptation_dump",
    "build_arg_parser",
    "load_options",
    "options_from_args",
    "pt_config_from_options",
]
