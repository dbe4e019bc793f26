"""Model families: neural image MLP, Ha-NeRF implicit mask head, planar graph."""

from marf_tpu.models.neural_image import NeuralImageConfig, init_neural_image, apply_neural_image
from marf_tpu.models.implicit_mask import init_implicit_mask, apply_implicit_mask, init_view_embedding
from marf_tpu.models.planar import PlanarConfig, init_graph_params, graph_forward, graph_loss
