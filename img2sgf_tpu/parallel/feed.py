"""Multi-host input feeding for the data-parallel mesh.

The reference is single-process (SURVEY §2.3); scale-out for this domain
is a bigger image batch across hosts. Each host decodes only its own slice
of the file list (hostio.batch_loader's native C++ decoder), and the
per-host arrays are assembled into one globally-sharded batch without any
cross-host data movement — every host's shard already lives on its own
chips, so the DCN carries nothing but the usual jit coordination traffic.

Single-process (tests, one-host pods) degenerates to the local case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_file_slice(files, process_index: int | None = None,
                     process_count: int | None = None):
    """The contiguous slice of `files` this host should decode.

    Files are dealt in contiguous runs (not round-robin) so each host's
    shard of the global batch is one block — matching the batch-major
    sharding of `make_global_batch` with zero reshuffling.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-len(files) // pc)
    return files[pi * per : (pi + 1) * per]


def make_global_batch(mesh: Mesh, local_batch: np.ndarray, axis: str = "data"):
    """Assemble per-host [B_local, ...] arrays into one global [B, ...]
    batch sharded batch-major over the mesh.

    Uses jax.make_array_from_process_local_data: each host provides only
    its slice; no host ever materializes the global batch.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_batch)


def feed_and_detect(mesh: Mesh, run, files, height: int, width: int,
                    thresholds=None, axis: str = "data"):
    """Decode this host's file slice and run the sharded detector.

    run: a detector from make_sharded_detector (global-batch jitted fn).
    files: the GLOBAL file list (identical on every host); each host
    decodes only its contiguous slice. thresholds, if given, is the GLOBAL
    per-file threshold array and is sliced identically. When len(files)
    does not divide by the process count, the tail is padded by repeating
    the last file so every host contributes a uniform-size shard (a
    make_array_from_process_local_data requirement); callers should ignore
    results beyond the original len(files). Returns the (sharded) result.
    """
    from ..config import choose_line_threshold
    from ..hostio.batch_loader import decode_batch

    pc = jax.process_count()
    n_files = len(files)
    per = -(-n_files // pc)
    n_pad = pc * per - n_files
    files = list(files) + [files[-1]] * n_pad
    if thresholds is None:
        t = float(choose_line_threshold(height, width))
        thr_global = np.full((len(files),), t, np.float32)
    else:
        thr_global = np.asarray(thresholds, np.float32)
        assert thr_global.shape[0] == n_files, (
            "thresholds must match the global file list length"
        )
        thr_global = np.concatenate(
            [thr_global, np.repeat(thr_global[-1:], n_pad)]
        ).astype(np.float32)

    pi = jax.process_index()
    mine = local_file_slice(files, pi, pc)
    local = decode_batch(mine, height, width)
    images = make_global_batch(mesh, local, axis=axis)
    thr = make_global_batch(mesh, thr_global[pi * per : (pi + 1) * per], axis=axis)
    return run(images, thr)
