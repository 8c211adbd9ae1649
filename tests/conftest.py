import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (never per-test)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    from pisa_ray.synth import make_corpus

    return make_corpus(300, n_partitions=3)


@pytest.fixture(scope="session")
def tiny_index(tiny_corpus, tmp_path_factory):
    """Built index over the tiny corpus (session-scoped; built once)."""
    from pisa_ray.build import IndexConfig, build_index

    d = str(tmp_path_factory.mktemp("idx"))
    build_index(
        tiny_corpus, d, IndexConfig(bucket_bits=2, term_parts=8, lineage_parts=1)
    )
    return d


@pytest.fixture(scope="session")
def tiny_oracle(tiny_corpus):
    from pisa_ray.docids import doc_ids_from_keys
    from pisa_ray.oracle import OracleIndex

    ids = doc_ids_from_keys(
        tiny_corpus["repo"], tiny_corpus["path"], tiny_corpus["commit"]
    )
    return OracleIndex(ids, tiny_corpus["content"].to_pylist())
