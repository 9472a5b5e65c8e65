"""Test config: run everything on a virtual 8-device CPU mesh.

This is the JAX-native 'fake backend' (SURVEY.md §4): sharding/mesh logic is
exercised for real without TPU hardware. The container environment force-
registers a remote single-chip TPU platform through a PYTHONPATH
sitecustomize hook that overrides JAX_PLATFORMS, so if we detect it we
re-exec pytest once in a cleaned environment."""

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)

_ON_TPU = os.environ.get('GMT_TESTS_ON_TPU') == '1'

_NEEDS_REEXEC = (
    not _ON_TPU
    and os.environ.get('GMT_CPU_REEXEC') != '1'
    and '.axon_site' in os.environ.get('PYTHONPATH', '')
)

if _NEEDS_REEXEC:
    # Re-exec pytest in a cleaned env (CPU x8 virtual devices): the container
    # force-registers a remote single-chip TPU backend via a PYTHONPATH
    # sitecustomize hook that overrides JAX_PLATFORMS. pytest's fd capture is
    # already active while this conftest loads, so first point fd 1/2 back at
    # the real stdout/stderr: pytest saved the originals as dup'd fds — find
    # them (pipes/ttys among open fds, where the capture files are regular
    # temp files) and dup2 them back.
    import stat

    def _restore_std_fds():
        import fcntl

        candidates = []
        for fd in range(3, 64):
            try:
                st = os.fstat(fd)
                flags = fcntl.fcntl(fd, fcntl.F_GETFL)
            except OSError:
                continue
            writable = (flags & os.O_ACCMODE) in (os.O_WRONLY, os.O_RDWR)
            # pytest's capture targets are unlinked TemporaryFiles
            # (st_nlink == 0); a real stdout is a pipe/tty/socket or a
            # still-linked regular file (shell redirect)
            real_file = stat.S_ISREG(st.st_mode) and st.st_nlink > 0
            if writable and (
                stat.S_ISFIFO(st.st_mode)
                or stat.S_ISCHR(st.st_mode)
                or stat.S_ISSOCK(st.st_mode)
                or real_file
            ):
                candidates.append(fd)
        if candidates:
            out = candidates[0]
            err = candidates[1] if len(candidates) > 1 else candidates[0]
            os.dup2(out, 1)
            os.dup2(err, 2)

    try:
        _restore_std_fds()
    except Exception:
        pass
    env = dict(
        os.environ,
        PYTHONPATH=_REPO,
        JAX_PLATFORMS='cpu',
        XLA_FLAGS='--xla_force_host_platform_device_count=8',
        GMT_CPU_REEXEC='1',
    )
    os.execve(
        sys.executable, [sys.executable, '-m', 'pytest'] + sys.argv[1:], env
    )

if not _ON_TPU:
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    _flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in _flags:
        os.environ['XLA_FLAGS'] = (
            _flags + ' --xla_force_host_platform_device_count=8'
        ).strip()

import jax

# Persistent XLA compilation cache (same machinery as the CLI's
# --compile_cache): the suite is compile-bound on a 1-core host, and the
# cache is keyed on HLO + compiler version, so re-runs (or the second of
# two chunked invocations hitting shared graphs) skip straight to
# execution. Opt out with GMT_TEST_COMPILE_CACHE=0.
if os.environ.get('GMT_TEST_COMPILE_CACHE', '1') != '0':
    jax.config.update(
        'jax_compilation_cache_dir',
        os.environ.get('GMT_TEST_COMPILE_CACHE_DIR', '/tmp/gmt_test_xla_cache'),
    )
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

if not _ON_TPU:
    assert jax.default_backend() == 'cpu' and len(jax.devices()) == 8, (
        jax.default_backend(),
        jax.devices(),
    )
# GMT_TESTS_ON_TPU=1 runs targeted single-device suites (parity curves,
# smoke) on the real chip, where jit compiles take seconds instead of the
# 20+ minutes XLA-CPU/LLVM needs for some conv graphs on this 1-core host.
# Mesh/sharding tests still require the default 8-device CPU mode.

import pytest  # noqa: E402


@pytest.fixture()
def tiny_G(tmp_path):
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.bs = 16
    G.hidden_size = 32
    G.epochs = 1
    G.logdir = tmp_path / 'logs'
    G.data_source = 'synthetic'
    return G
