"""Dataset readers (ref `BundleTrack/scripts/data_reader.py`)."""
from bundlesdf_tpu.datasets.readers import Ho3dReader, YcbineoatReader
