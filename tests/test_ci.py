"""Import smoke test (mirrors reference test/test_ci.py:7-8)."""


def test_package_imports():
    import queasars_tpu
    import queasars_tpu.paulis
    import queasars_tpu.problems.jssp
    import queasars_tpu.sim
    import queasars_tpu.genome
    import queasars_tpu.optim
    import queasars_tpu.evolve
    import queasars_tpu.solver
    import queasars_tpu.parallel
    import queasars_tpu.utils

    assert queasars_tpu.__version__
