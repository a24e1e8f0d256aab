"""video_learning_tpu: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
LRCN-style video classification + captioning framework npit/video-learning-tf.

Layer map (mirrors SURVEY.md §1):
  defs.py / config.py            — config vocabulary + YAML settings
  data/                          — offline packing, record IO, runtime feeding
  ops/                           — fusion ops, device preprocessing, kernels
  models/                        — AlexNet / LSTM / audionet / pipeline DAG
  parallel/                      — mesh + sharding (pjit) utilities
  train.py / val.py / run_task.py— engines and CLI driver
  metrics/                       — caption metrics (BLEU/ROUGE-L/CIDEr/…)
  checkpoint.py                  — param checkpoints + .snap sidecars
  tools/                         — ensembling, inspection, ops tooling
"""

__version__ = "0.1.0"
