"""CLI entry points (reference L9: the run_* scripts).

Each module exposes ``main(argv=None)``; the file contracts (image lists,
PAGE-XML layout, graph-feature JSONs, confidence JSONs) match the reference.
Host-process fan-out (ProcessPoolExecutor / subprocess-per-file / fresh JVMs)
is replaced by in-process batched device execution.
"""
