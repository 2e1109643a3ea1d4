"""REAL multi-process distributed training (2 processes x 2 CPU devices).

The rest of the suite validates sharding on a single-process 8-virtual-device
mesh; here the cluster is genuinely multi-process: two subprocesses join via
`jax.distributed` (gloo collectives standing in for DCN), each feeds only its
`local_batch_slice` through `global_batch_from_local`, and both execute the
flagship light training step as one SPMD program over the data mesh. The
single-process run of the same global batch is the numerics ground truth —
this is the strongest multi-host evidence obtainable without pod hardware
(SURVEY.md §5.8; reference parallelism anchor:
/root/reference/trainBRDF.py:105-109). The gloo-backend caveats this setup
works around (and why the cross-process mesh is data-only) are documented in
tests/mp_worker.py.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

IM_HW, ENV_RC = (64, 80), (32, 40)
NPROCS, LOCAL_DEVICES = 2, 2
GLOBAL_B = NPROCS * LOCAL_DEVICES

pytestmark = pytest.mark.slow

needs4 = pytest.mark.skipif(
    len(jax.devices()) < GLOBAL_B, reason="needs 4 virtual devices"
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(timeout=480):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # conftest's 8-device flag; workers set their own
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(NPROCS), str(port),
             str(LOCAL_DEVICES)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(NPROCS)
    ]
    results = {}
    try:
        for i, p in enumerate(procs):
            out, err = p.communicate(timeout=timeout)
            assert p.returncode == 0, (
                f"worker {i} rc={p.returncode}\nstdout:\n{out}\n"
                f"stderr:\n{err[-3000:]}"
            )
            for line in out.splitlines():
                if line.startswith("MPRESULT "):
                    results[i] = json.loads(line[len("MPRESULT "):])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert sorted(results) == list(range(NPROCS)), results
    return results


def _single_process_truth():
    from inverserenderingofindoorscene_tpu.data.synthetic import (
        synthetic_batch,
    )
    from inverserenderingofindoorscene_tpu.parallel.mesh import (
        make_mesh,
        replicated,
        shard_batch,
    )
    from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
    from inverserenderingofindoorscene_tpu.pipeline.light import LightNets
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        make_light_train_step,
        reference_adam,
    )

    brdf_nets = BRDFNets(cascade_level=0)
    light_nets = LightNets(
        cascade_level=0, env_rows=ENV_RC[0], env_cols=ENV_RC[1]
    )
    bp = brdf_nets.init(jax.random.PRNGKey(0), IM_HW)
    lp = light_nets.init(jax.random.PRNGKey(1))
    state = create_train_state(lp, reference_adam(1e-4))
    batch = synthetic_batch(
        batch=GLOBAL_B, im_hw=IM_HW, env_rc=ENV_RC, seed=7
    )

    # same mesh shape as the cluster: 4 devices, data-only
    mesh = make_mesh(jax.devices()[:GLOBAL_B], tile=1)
    with jax.set_mesh(mesh):
        rep = replicated(mesh)
        bp = jax.device_put(bp, rep)
        state = jax.device_put(state, rep)
        sbatch = shard_batch(batch, mesh)
        step = jax.jit(
            make_light_train_step(brdf_nets, light_nets, bp),
            donate_argnums=(0,),
        )
        state, metrics = step(state, sbatch)
        jax.block_until_ready(metrics)
    checksum = float(
        sum(
            np.abs(np.asarray(leaf, np.float64)).sum()
            for leaf in jax.tree_util.tree_leaves(jax.device_get(state.params))
        )
    )
    return {k: float(v) for k, v in metrics.items()}, checksum


@needs4
def test_two_process_cluster_matches_single_process():
    results = _run_cluster()

    # both processes computed the SAME global step
    m0, m1 = results[0]["metrics"], results[1]["metrics"]
    assert set(m0) == set(m1)
    for k in m0:
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-6, err_msg=k)
    np.testing.assert_allclose(
        results[0]["param_checksum"], results[1]["param_checksum"], rtol=1e-9
    )

    # ... and it matches the single-process ground truth (different device
    # partitioning -> different f32 reduction order; tolerance as in
    # tests/test_shard_map.py)
    truth, checksum = _single_process_truth()
    for k in truth:
        np.testing.assert_allclose(m0[k], truth[k], rtol=2e-4, err_msg=k)
    np.testing.assert_allclose(
        results[0]["param_checksum"], checksum, rtol=1e-6
    )
