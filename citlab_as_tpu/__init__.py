"""citlab_as_tpu — TPU-native article-separation framework.

A ground-up JAX/XLA/Pallas rebuild of the NewsEye article-separation (AS)
pipeline (reference: CITlabRostock/citlab-article-separation-new). Input:
scanned newspaper page images + PAGE-XML metadata; output: PAGE-XML where
every text line carries an article id.

Pipeline stages (all TPU-first):
  1. Separator detection   — ARU-Net segmentation (JAX/Pallas) + device post-processing
  2. Text block detection  — DBSCAN baseline clustering + alpha-shape regions
  3. Heading detection     — ARU-Net heading net fused with stroke-width transform
  4. GNN relation model    — segment-sum message passing GraphLSTM
  5. Text block clustering — greedy / DBSCAN / linkage over the confidence matrix

Package layout:
  geometry/  host + jittable geometry kernels (replaces java_util/Util.class)
  pagexml/   PAGE-XML data model (reference: python_util/parser/xml/page/)
  ops/       device image ops (resize, otsu, morphology, distance transform, CC)
  models/    ARU-Net + GNN in JAX
  stages/    the five pipeline stages as pure functions over PageDocument
  train/     optax trainers, input pipeline, orbax checkpoints
  eval/      AS measure + split/merge comparator
  parallel/  mesh/sharding helpers (pjit data parallel over ICI)
  cli/       run_* entry points preserving the reference's file contracts
"""

__version__ = "0.1.0"
