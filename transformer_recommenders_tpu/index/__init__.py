from transformer_recommenders_tpu.index.device_index import DeviceIndex
from transformer_recommenders_tpu.index.host_index import HostIndex

INDEX_BACKENDS = {"device": DeviceIndex, "host": HostIndex}

__all__ = ["DeviceIndex", "HostIndex", "INDEX_BACKENDS"]
