from transformer_recommenders_tpu.index.device_index import DeviceIndex
from transformer_recommenders_tpu.index.host_index import HostIndex
from transformer_recommenders_tpu.index.text_index import BM25TextIndex

INDEX_BACKENDS = {"device": DeviceIndex, "host": HostIndex}

__all__ = ["BM25TextIndex", "DeviceIndex", "HostIndex", "INDEX_BACKENDS"]
