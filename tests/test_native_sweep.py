"""Native C++ sweep vs the pure-Python libstdc++ replica on tie-heavy input.

The detailed sweep's event heap compares ONLY sent timestamps
(CompareMessagesBySentTime, reference src/message.cpp:61-65), so equal
keys pop in whatever order libstdc++'s sift produces — and the results
(rolling mean, densities, sim_time) depend on that order. The native
scheduler reimplements the heap with a branchless sift
(sanafe_tpu/native_src/scheduler.cpp lite_heap_push/lite_heap_pop); this test pins its
tie behavior against the pure-Python LibstdcxxMinHeap replica
(ops/timing.py) on a chip whose uniform hardware costs make sent
timestamps collide constantly.
"""

import numpy as np
import pytest

import __graft_entry__ as ge


def _per_step_times(chip, steps):
    rv = chip.sim(steps, timing_model="detailed", perf_trace=True,
                  heartbeat=0)
    return np.asarray(rv["perf_trace"].data["sim_time"], dtype=np.float64)


@pytest.fixture(scope="module")
def tie_heavy_times():
    # uniform per-event costs on every core -> massive sent-ts ties
    chip = ge._build_chip(tiles_x=3, tiles_y=3, cores_per_tile=3,
                          neurons_per_core=48, layers=4)
    native = chip._get_native_scheduler()
    times_native = _per_step_times(chip, 40) if native is not None else None

    chip2 = ge._build_chip(tiles_x=3, tiles_y=3, cores_per_tile=3,
                           neurons_per_core=48, layers=4)
    chip2._native_failed = True  # force the pure-Python sweep
    times_python = _per_step_times(chip2, 40)
    return times_native, times_python


def test_native_matches_python_replica_on_ties(tie_heavy_times):
    times_native, times_python = tie_heavy_times
    if times_native is None:
        pytest.skip("native scheduler unavailable (no C++ toolchain)")
    assert times_python.shape == times_native.shape
    np.testing.assert_array_equal(times_native, times_python)


def test_non_monotone_chip_matches_python_replica():
    """A negative processing latency breaks the nondecreasing-receive-time
    invariant, forcing the native scheduler's full-scan (non-lite)
    retirement path — pin it against the Python replica too."""
    import sanafe_tpu as sf

    chip = ge._build_chip(tiles_x=2, tiles_y=2, cores_per_tile=2,
                          neurons_per_core=32, layers=3)
    if chip._get_native_scheduler() is None:
        pytest.skip("native scheduler unavailable (no C++ toolchain)")

    def negate(chip):
        c = chip.compiled
        c.axon_const_processing_latency = -np.abs(
            c.axon_const_processing_latency
        )
        chip._native = None  # rebuild the native layout from mutated arrays
        chip._programs.clear()
        chip._scan_cache.clear()
        return chip

    chip = negate(chip)
    assert chip._get_native_scheduler()._lib is not None
    t_native = _per_step_times(chip, 25)

    chip2 = negate(ge._build_chip(tiles_x=2, tiles_y=2, cores_per_tile=2,
                                  neurons_per_core=32, layers=3))
    chip2._native_failed = True
    t_python = _per_step_times(chip2, 25)
    np.testing.assert_array_equal(t_native, t_python)
    assert (t_python != 0).any()


def test_tie_heavy_run_is_nontrivial(tie_heavy_times):
    """The fixture must actually exercise congestion/ties: several
    distinct per-step times and nonzero totals, else the equality test
    proves nothing."""
    _, times_python = tie_heavy_times
    assert (times_python > 0).all()
    assert len(np.unique(times_python)) >= 3


def test_sweep_lane_count_is_bit_exact(monkeypatch):
    """run_chunk_packed interleaves the sweeps of SANAFE_SWEEP_LANES
    independent timesteps (sweep_timestep_lite_group); interleaving must
    not change any step's float64 result. Drive the packed entry point
    directly with random masks (including a ragged tail group) and pin
    every lane count to the serial (lanes=1) output."""
    import numpy as np

    chip = ge._build_chip(tiles_x=3, tiles_y=3, cores_per_tile=3,
                          neurons_per_core=48, layers=4)
    native = chip._get_native_scheduler()
    if native is None:
        pytest.skip("native scheduler unavailable (no C++ toolchain)")
    mask_bytes = (chip.compiled.n_neurons + 7) // 8
    rng = np.random.default_rng(7)
    # 33 steps: with 8 lanes the tail group has 1 step
    masks = rng.integers(0, 256, size=(33, 2, mask_bytes), dtype=np.uint8)
    monkeypatch.setenv("SANAFE_SWEEP_LANES", "1")
    base = native.run_chunk_packed(masks, 0.5)
    assert (base > 0).all()
    for lanes in ("2", "3", "8"):
        monkeypatch.setenv("SANAFE_SWEEP_LANES", lanes)
        np.testing.assert_array_equal(
            native.run_chunk_packed(masks, 0.5), base
        )
