"""Synthetic data generation for hermetic tests and benchmarks.

The reference's inline tests require ~GB real HDF5 files (SURVEY.md §4). These helpers
produce (a) small in-memory datasets with the same statistical structure (diurnal +
seasonal TEC cycles over a lat/lon grid) and (b) tiny on-disk HDF5 files with the exact
dataset layout of the CRIM files (see hdf5_io.py) so the ingestion path is testable.
"""

from __future__ import annotations

import numpy as np

# Default 1-degree China-region grid matching the reference's 41x71 extent
# (TEC-MoLLM-PRD.md:21: 1x1 degree grid, 41x71 = 2911 nodes).
DEFAULT_LAT0 = 10.0
DEFAULT_LON0 = 70.0


def grid_coordinates(grid_h: int = 41, grid_w: int = 71) -> tuple[np.ndarray, np.ndarray]:
    lat = DEFAULT_LAT0 + np.arange(grid_h, dtype=np.float64)
    lon = DEFAULT_LON0 + np.arange(grid_w, dtype=np.float64)
    return lat, lon


def synthetic_raw_data(
    num_steps: int = 240,
    grid_h: int = 41,
    grid_w: int = 71,
    start: str = "2014-01-01T00:00:00",
    seed: int = 0,
    times: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """In-memory equivalent of one aggregated CRIM dataset.

    TEC follows a physically plausible pattern: a latitude-dependent mean plus diurnal
    and seasonal cycles plus noise, clipped to [0, 200] TECU. Space-weather indices are
    smooth random walks. 2-hour cadence (12 steps/day) like the real data.

    `times` (datetime64[s], len num_steps) overrides the contiguous range from
    `start`; the diurnal/seasonal pattern is computed FROM the given timestamps,
    so callers that piece together disjoint calendar ranges (preprocess
    --synthetic spreads data over the train/val/test year windows) get TEC whose
    phase is consistent with its time-feature labels. Without this, val/test
    carried day-of-year labels from a different season than their data — the
    time embeddings then actively mislead any trained model on those splits.
    """
    rng = np.random.default_rng(seed)
    lat, lon = grid_coordinates(grid_h, grid_w)
    if times is None:
        times = np.datetime64(start, "s") + np.arange(num_steps) * np.timedelta64(
            7200, "s"
        )
    else:
        times = np.asarray(times, dtype="datetime64[s]")
        assert times.shape == (num_steps,), (times.shape, num_steps)

    hours = times.astype("datetime64[h]").astype(np.int64) % 24
    days = times.astype("datetime64[D]").astype(np.int64)
    diurnal = np.sin(2 * np.pi * (hours[:, None, None] - 14) / 24.0)
    seasonal = np.cos(2 * np.pi * days[:, None, None] / 365.25)
    lat_profile = 30.0 - 0.3 * np.abs(lat[None, :, None] - lat.mean())
    tec = (
        lat_profile
        + 12.0 * diurnal
        + 5.0 * seasonal
        + rng.normal(0, 1.5, size=(num_steps, grid_h, grid_w))
    )
    tec = np.clip(tec, 0.0, 200.0).astype(np.float32)

    walks = np.cumsum(rng.normal(0, 1, size=(num_steps, 5)), axis=0)
    base = np.array([200.0, -20.0, 120.0, 3.0, 15.0])
    scale = np.array([50.0, 10.0, 20.0, 0.5, 5.0])
    indices = (base + scale * walks / np.sqrt(np.arange(1, num_steps + 1))[:, None]).astype(
        np.float32
    )

    return {
        "tec": tec,
        "time": times,
        "space_weather_indices": indices,
        "latitude": lat,
        "longitude": lon,
    }


def write_synthetic_hdf5(
    path: str,
    year: int = 2014,
    num_steps: int = 48,
    grid_h: int = 41,
    grid_w: int = 71,
    seed: int = 0,
) -> None:
    """Write a miniature CRIM-layout HDF5 file (same dataset paths as hdf5_io.py expects,
    including the Kp scale_factor attribute exercised by data_loader.py:47-50)."""
    import h5py

    raw = synthetic_raw_data(
        num_steps=num_steps,
        grid_h=grid_h,
        grid_w=grid_w,
        start=f"{year}-01-01T00:00:00",
        seed=seed + year,
    )
    time_strs = np.array(
        [np.datetime_as_string(t, unit="s").encode() for t in raw["time"]]
    )
    with h5py.File(path, "w") as f:
        f.create_dataset("ionosphere/TEC", data=raw["tec"])
        f.create_dataset("coordinates/datetime_utc", data=time_strs)
        f.create_dataset("coordinates/latitude", data=raw["latitude"])
        f.create_dataset("coordinates/longitude", data=raw["longitude"])
        names = ["AE_Index", "Dst_Index", "F107_Index", "Kp_Index", "ap_Index"]
        for i, name in enumerate(names):
            col = raw["space_weather_indices"][:, i]
            if name == "Kp_Index":
                # store scaled-by-10 ints with a scale_factor attr, like the real files
                ds = f.create_dataset(
                    f"space_weather_indices/{name}", data=np.round(col * 10).astype(np.int32)
                )
                ds.attrs["scale_factor"] = 0.1
            else:
                f.create_dataset(f"space_weather_indices/{name}", data=col)


def synthetic_processed_split(
    num_windows: int,
    L_in: int,
    L_out: int,
    num_nodes: int,
    in_features: int = 6,
    num_years: int = 13,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Directly fabricate a processed split {X, Y, time_features} (already standardized)
    of exactly the length needed for `num_windows` stride-1 windows."""
    rng = np.random.default_rng(seed)
    # SlidingWindowDataset counts T - L_in - L_out + 1 stride-1 windows
    # (reference dataset.py:46), so:
    t = num_windows + L_in + L_out - 1
    x = rng.normal(0, 1, size=(t, num_nodes, in_features)).astype(np.float32)
    y = rng.normal(0, 1, size=(t, num_nodes, L_out)).astype(np.float32)
    steps = np.arange(t)
    tf = np.stack(
        [
            steps % 12,
            (steps // 12) % 366,
            np.zeros_like(steps) if num_years == 1 else (steps // (12 * 366)) % num_years,
            (steps // (12 * 91)) % 4,
        ],
        axis=-1,
    ).astype(np.int32)
    return {"X": x, "Y": y, "time_features": tf}
