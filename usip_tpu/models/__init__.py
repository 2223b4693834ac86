from usip_tpu.models.descriptor import Descriptor
from usip_tpu.models.detector import Detector, KNNFusionOnNodes, KeypointHead

__all__ = ["Descriptor", "Detector", "KNNFusionOnNodes", "KeypointHead"]
