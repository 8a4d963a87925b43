"""realtimeobjectdetection_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of
the capabilities of uguryagmur/RealTimeObjectDetection.

Layer map (see SURVEY.md for the reference analysis this is built to):

* :mod:`.cfg_parser` — Darknet ``.cfg`` -> typed GraphSpec (pure data)
* :mod:`.weights`    — raw ``.weights``/torch-state-dict -> JAX pytrees
* :mod:`.model`      — GraphSpec -> one jitted NHWC XLA computation
* :mod:`.ops`        — decode, fixed-shape NMS, IoU, letterbox
* :mod:`.data`       — VOC / COCO datasets + prefetching loaders
* :mod:`.train`      — data-parallel training (optax + orbax + pjit)
* :mod:`.eval`       — precision/recall/F validator, ROC sweep
* :mod:`.pipeline`   — folder/stream detectors, rendering, metrics.json
* :mod:`.parallel`   — device mesh + sharding helpers
"""

__version__ = "0.1.0"

from .cfg_parser import GraphSpec, load_graph_spec  # noqa: F401
from .weights import load_darknet_weights, init_params  # noqa: F401
from .model import Darknet, fold_batchnorm, make_forward  # noqa: F401
