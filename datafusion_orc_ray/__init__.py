"""datafusion_orc_ray — Ray-Data-native per-column lightweight-compression
engine with the query/data-processing capabilities of
datafusion-contrib/datafusion-orc (see SURVEY.md).

Layers:
  codecs/     pure NumPy/pyarrow encoding kernels (no Ray)
  stripe.py   stripe blob format (encode/decode pa.Table)
  stages/     map_batches-ready encode/decode/stats stages
  sources/    stripe reader -> ray.data.Dataset, fragment planning
  pipelines/  end-to-end pipelines: encode/decode, dedup, similarity, text
  state/      manifests, checkpoint/resume
"""

__version__ = "0.1.0"
