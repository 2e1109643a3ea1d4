"""One process of the multi-process cluster test (tests/test_multiprocess.py).

NOT a pytest module (no ``test_`` prefix): launched as a subprocess, one per
simulated host. Each process joins the jax.distributed cluster, loads ONLY
its slice of the global batch (`local_batch_slice`), assembles the global
sharded batch (`global_batch_from_local`), runs ONE light training step as
an SPMD program over the data mesh, and prints a JSON line with the metrics
and a param checksum for the parent test to compare — across processes, and
against the single-process ground truth.

This is the real multi-host execution model (SURVEY.md §5.8; the reference's
only parallelism is single-process nn.DataParallel, trainBRDF.py:105-109):
same program on every host, params replicated, cross-process reductions
inserted by XLA.

Measured facts about the XLA:CPU gloo backend that shape this worker (all
reproduced with standalone probes, 2026-08-18):

* ``jax.device_put(tree, replicated)`` on a multi-process mesh runs a
  ``process_allgather`` consistency check PER LEAF over gloo — ~2 min for a
  param tree, and it can wedge the cluster. Replicated arrays are built with
  ``jax.make_array_from_callback`` instead (no collective; seeds are
  identical on every process by construction).
* Two collective sub-cliques created concurrently (a {data:2, tile:2} mesh
  puts TWO 4-device data-groups across the processes) deadlock in gloo
  context rendezvous. Cross-process meshes here are data-only — which is
  also the realistic pod topology (tile rides ICI within a host, only the
  data axis crosses DCN). Tile-axis sharding is covered by the
  single-process 8-device tests (tests/test_parallel.py).
* The first cross-process collective of a program must start
  near-simultaneously on all processes (gloo context init has a 30 s
  rendezvous deadline, and each process compiles independently) — hence
  AOT compile bracketed by tiny barrier collectives.
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    local_devices = int(sys.argv[4])

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from inverserenderingofindoorscene_tpu.parallel import multihost

    # before any backend-touching jax call
    multihost.initialize_cpu_cluster(
        f"127.0.0.1:{port}", nprocs, pid, local_devices=local_devices
    )

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_index() == pid
    assert len(jax.devices()) == nprocs * local_devices
    assert len(jax.local_devices()) == local_devices

    from inverserenderingofindoorscene_tpu.data.synthetic import (
        synthetic_batch,
    )
    from inverserenderingofindoorscene_tpu.parallel.mesh import (
        make_mesh,
        replicated,
    )
    from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
    from inverserenderingofindoorscene_tpu.pipeline.light import LightNets
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        make_light_train_step,
        reference_adam,
    )

    im_hw, env_rc = (64, 80), (32, 40)
    global_b = nprocs * local_devices

    # Same deterministic "dataset" on every process; each loads its rows.
    gbatch = synthetic_batch(
        batch=global_b, im_hw=im_hw, env_rc=env_rc, seed=7
    )
    s, e = multihost.local_batch_slice(pid, nprocs, global_b)
    local = {k: np.asarray(v)[s:e] for k, v in gbatch.items()}

    mesh = make_mesh(jax.devices(), tile=1)  # data-only across processes
    batch = multihost.global_batch_from_local(local, mesh)

    # Identical seeds on every process -> identical replicated params.
    brdf_nets = BRDFNets(cascade_level=0)
    light_nets = LightNets(
        cascade_level=0, env_rows=env_rc[0], env_cols=env_rc[1]
    )
    bp = brdf_nets.init(jax.random.PRNGKey(0), im_hw)
    lp = light_nets.init(jax.random.PRNGKey(1))
    state = create_train_state(lp, reference_adam(1e-4))

    with jax.set_mesh(mesh):
        rep = replicated(mesh)

        def rep_tree(tree):
            """Replicate identical host data WITHOUT the per-leaf gloo
            allgather that jax.device_put(tree, replicated) performs."""
            return jtu.tree_map(
                lambda leaf: jax.make_array_from_callback(
                    np.shape(leaf), rep, lambda idx: np.asarray(leaf)[idx]
                ),
                tree,
            )

        bp = rep_tree(bp)
        state = rep_tree(state)

        def barrier(tag: float):
            """Tiny all-device collective: creates/warms the full-world gloo
            context and synchronizes the processes."""
            x = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(("data", "tile"))),
                np.ones((local_devices, 1), np.float32),
            )
            t = jax.jit(
                lambda v: jnp.sum(v) + tag,
                out_shardings=NamedSharding(mesh, P()),
            )(x)
            got = float(np.asarray(jax.device_get(t)))
            assert got == nprocs * local_devices + tag, got

        barrier(0.0)
        step = jax.jit(
            make_light_train_step(brdf_nets, light_nets, bp),
            donate_argnums=(0,),
        )
        # AOT-compile, then re-sync: execution (the first cross-process
        # collective of THIS program) must start near-simultaneously.
        compiled = step.lower(state, batch).compile()
        barrier(1.0)
        state, metrics = compiled(state, batch)
        jax.block_until_ready(metrics)

    checksum = float(
        sum(
            np.abs(np.asarray(leaf, np.float64)).sum()
            for leaf in jtu.tree_leaves(jax.device_get(state.params))
        )
    )
    print(
        "MPRESULT "
        + json.dumps(
            {
                "process": pid,
                "metrics": {k: float(v) for k, v in metrics.items()},
                "param_checksum": checksum,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
