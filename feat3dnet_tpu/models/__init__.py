"""Model family: 3DFeat-Net detector + descriptor, TPU-native.

Reference layer map (SURVEY.md §1 L2): models/feat3dnet.py, models/layers.py,
models/pointnet_common.py, models/net_factory.py in /root/reference.
"""
from feat3dnet_tpu.models.feat3dnet import Feat3DNet, Feat3DNetOutput
from feat3dnet_tpu.models.net_factory import get_network, register_network

__all__ = ["Feat3DNet", "Feat3DNetOutput", "get_network", "register_network"]
