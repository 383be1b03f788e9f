"""Production serving: AOT-exported predict artifacts and a
dynamic-batching inference server.

The reference ships inference only as a notebook
(/root/reference/notebook/VideoTransformer_demo.ipynb cells 6-15); this
package turns that path into deployable machinery: a sealed StableHLO
artifact (export.py) and a server whose batching is shaped around XLA's
static-shape compilation model (server.py).
"""

from videotransformer_tpu.serving.export import (  # noqa: F401
    ExportedPredictor, export_predictor, load_predictor, make_predict_fn)
from videotransformer_tpu.serving.server import InferenceServer  # noqa: F401
