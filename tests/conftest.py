"""Test harness: force the CPU backend with 8 virtual devices.

Mirrors the reference's Spark local[2] test harness
(`hail/python/test/hail/helpers.py:17-42`): tests exercise real partitioning
and mesh sharding without TPU hardware. The axon TPU tunnel is single-tenant
and its remote compiles are slow, so tests must never touch it —
`jax.config.update('jax_platforms', 'cpu')` overrides the kernel env's
JAX_PLATFORMS=axon.
"""

import os

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import pytest


@pytest.fixture(scope='session', autouse=True)
def hl_session():
    import hail_tpu as hl
    hl.init(global_seed=0)
    yield
    hl.stop()


@pytest.fixture
def hl():
    import hail_tpu as hl
    return hl


SAMPLE_VCF = '/root/reference/hail/hail/test/resources/sample.vcf'


@pytest.fixture(scope='session')
def sample_mt():
    import hail_tpu as hl
    if not os.path.exists(SAMPLE_VCF):
        pytest.skip('reference sample.vcf fixture not available')
    return hl.import_vcf(SAMPLE_VCF, n_partitions=3).persist()
