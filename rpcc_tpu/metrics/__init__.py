"""Evaluation metrics."""

from rpcc_tpu.metrics.chamfer import calc_chamfer_distance, nn_distances
from rpcc_tpu.metrics.psnr import calc_point_to_point_plane_psnr, psnr
