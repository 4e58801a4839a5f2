"""IF data I/O: capture-file ingest, synthetic signal generation, artifacts."""

from gps_sdr_tpu.io.ifdata import IFSampleSource, write_if_file
from gps_sdr_tpu.io.synthetic import SyntheticSV, generate_if_samples

__all__ = ["IFSampleSource", "write_if_file", "SyntheticSV",
           "generate_if_samples"]
