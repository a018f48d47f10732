"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    from nailray.context import configure

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    configure(quiet=True)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory) -> str:
    """Small deterministic corpus parquet (F0 fixture), written once."""
    from nailray.corpus import write_corpus

    d = tmp_path_factory.mktemp("corpus")
    return write_corpus(str(d), n_rows=2000, seed=42, n_files=2, row_group_size=500)


@pytest.fixture(scope="session")
def corpus_table(corpus_dir):
    import pyarrow.parquet as pq
    import pyarrow as pa

    import os

    tables = [
        pq.read_table(os.path.join(corpus_dir, f))
        for f in sorted(os.listdir(corpus_dir))
        if f.endswith(".parquet")
    ]
    return pa.concat_tables(tables)
