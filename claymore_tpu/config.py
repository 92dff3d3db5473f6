"""Simulation configuration.

TPU-native re-design of the reference's compile-time ``constexpr`` config
namespace (reference: Projects/GMPM/settings.h:33-96 and
Projects/MGSP/settings.h:30-119).  Everything that was a C++ template
parameter becomes a frozen dataclass field here; JAX re-traces when a field
changes, which plays the role of template re-instantiation.

All shapes derived from this config are static so every step stays inside a
single jitted computation (no host round trips for capacity management; the
reference's capacity-growth heuristics, gmpm_simulator.cuh:283-300, become
fixed capacities chosen up front).
"""

from __future__ import annotations

import dataclasses
import math
from functools import cached_property


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static simulation configuration (one per compiled engine)."""

    # --- background grid geometry (reference settings.h:56-72) ---
    domain_bits: int = 8          # grid resolution = 2**domain_bits per axis
    block_bits: int = 2           # cells per block edge = 2**block_bits (4^3 blocks)

    # --- capacities (static shapes; reference settings.h:88-94) ---
    max_active_blocks: int = 8192     # sparse grid pool capacity (blocks)
    particle_tile: int = 256          # particles per compute tile (lane-friendly)
    max_tiles: int = 0                # 0 -> derived from particle capacity at init

    # --- transfer scheme ---
    ppc: float = 8.0              # particles per cell used for default volumes
    cfl: float = 0.5

    # --- physics ---
    gravity: tuple[float, float, float] = (0.0, -9.8, 0.0)
    bound_blocks: int = 2         # sticky slab thickness in blocks at domain faces
    # (reference G_BOUNDARY_CONDITION = 2, settings.h:63)

    # --- stepping ---
    default_dt: float = 1e-4
    fps: int = 24
    # hard cap on substeps per on-device frame loop (backstop so run_frame's
    # lax.while_loop terminates in bounded time even under pathological dt;
    # the reference aborts via its host-side NaN readback,
    # gmpm_simulator.cuh:355-358)
    max_substeps_per_frame: int = 1_000_000

    # --- transfer matmul precision ---
    # TPU MXUs are bf16 hardware; f32 matmuls are emulated in bf16 passes:
    # "highest" = 6 passes (true f32), "high" = 3 passes (~2^-21 relative
    # error, twice as fast), "default" = 1 pass (2^-8: below the physics).
    # Default "high": the two transfer dots are 61% of the flagship substep
    # at "highest" (ABLATE_KERNEL.json), the P2G MASS channel is re-done
    # exactly in a tiny side dot regardless (ops/pallas_g2p2g.py), so
    # conservation stays at f32 roundoff, and the 2^-21 momentum/stress
    # error sits far below both the bf16 arena storage quantization (2^-9)
    # and dt-level time-discretization error.  Multi-frame conservation/
    # divergence soak: SOAK_PRECISION.json (scripts/soak_precision.py).
    # Non-TPU backends compute exact f32 (the flag is a no-op there) unless
    # force_mxu_split=True below.
    mxu_precision: str = "high"

    # --- test hook: emulate the bf16x3 split off-TPU ---
    # On CPU/interpret backends the native f32 dot is exact, so the manual
    # hi/lo split (and its interplay with the exact-mass side dot) is
    # normally skipped there — which means no CI configuration exercises
    # the shipping "high" arithmetic.  force_mxu_split=True runs the split
    # on every backend so interpret-mode tests cover the exact code path
    # the chip executes (VERDICT r4 weak #5).  Never needed on TPU.
    force_mxu_split: bool = False

    # --- G2P dot precision override (Pallas backend only) ---
    # The G2P contraction's value operand is already quantized to bf16
    # under the default arenas (2^-9 storage), so a 1-pass DEFAULT dot
    # only adds a same-order 2^-8 truncation on the WEIGHT operand — and
    # G2P carries no conservation invariant (mass is P2G-side, where the
    # exact side dot lives).  None -> inherit mxu_precision.  "default"
    # promoted per the round-5 lever sweep (PROF_LEVERS.json: ~4% of the
    # 12M substep) with conservation / divergence evidence in
    # SOAK_PRECISION.json (bf16_high_g2pdflt: momentum tracks the f32
    # baseline through impact, cloud divergence same order as every
    # other quantized variant, mass bit-exact).
    g2p_dot_precision: str | None = "default"

    # --- G2P arena storage precision (Pallas backend only) ---
    # "bfloat16" stores the gathered grid-velocity windows in bf16, halving
    # the arena-temp HBM write + the kernel's streamed read (the G2P input
    # is the largest stream at flagship scale).  Mass rows are untouched
    # (P2G accumulates in f32), so conservation is unaffected; particle
    # velocities pick up ~2^-9 relative storage quantization per gather —
    # the same order as one substep's B-spline interpolation error at CFL
    # drift.  Default "bfloat16" after the multi-frame conservation soak
    # (SOAK_PRECISION.json): mass stays bit-identical to f32 arenas, grid
    # momentum tracks at storage precision, loss counters zero.  Exact-
    # equivalence tests pin "float32" (the oracle path never quantizes).
    g2p_arena_dtype: str = "bfloat16"

    # --- G2P window delivery (Pallas backend only) ---
    # True: the kernel double-buffer DMAs its 4x2 window rows straight from
    # the HBM pool (prefetching one program ahead), eliminating the XLA
    # gather + arena temp write + kernel re-read, and skipping fetches for
    # dead programs outright.  With g2p_arena_dtype="bfloat16" the grid
    # kernel stores the velocity pool itself in bf16 (same rounding the
    # gather applied), so the DMA windows ride at half width.  False: XLA
    # row gather into an arena temp, converting dtypes at the gather.
    g2p_window_dma: bool = True

    # --- lazy rebucketing ---
    # Rebuild buckets/partition every K substeps instead of every substep
    # (the reference rebuilds every step).  K>1 amortizes the sort+permute
    # chain; the transfer arena widens from 2^3 to 4^3 blocks to tolerate up
    # to ceil(K/2) cells of drift (CFL guarantees <= 0.5 cells/step).
    rebucket_every: int = 1

    # --- incremental (stable-tile) rebucketing ---
    # Most rebuckets only RELOCATE the particles whose home block changed
    # (the reference's add_advection bucket update,
    # particle_buffer.cuh:100-135) instead of re-sorting every slot; a full
    # sort/compaction runs every ``defrag_every``-th rebucket to heal tile
    # fragmentation.  defrag_every=1 disables the incremental path.
    # mover_capacity_frac sizes the per-rebucket mover buffer; overflow
    # movers are DEFERRED to the next rebucket (kept simulating in their old
    # tile, which the arena drift tolerance covers for one window), not lost.
    #
    # DEFAULT OFF: on TPU, scatter costs ~75 ns/index (measured v5e) while
    # the full sort's row gather moves 1.65M rows in ~9 ms, so the sparse
    # path only wins for low-churn scenes (<~2% movers per window, e.g.
    # settled granular beds) — synchronized motion (a falling body) makes
    # 10-25% of particles change blocks in the same window and the scatter
    # path loses outright (docs/benchmarks.md, round 2).
    defrag_every: int = 1
    mover_capacity_frac: float = 0.125

    # --- drift-triggered (auto) rebucketing, single chip ---
    # Rebuild buckets/partition only when some particle could leave its
    # tile's transfer arena on the next substep, instead of on a fixed
    # schedule.  The per-substep margin check is one elementwise pass +
    # min-reduce over positions; the rebuild itself (sort + permutation
    # gather + partition rebuild, ~25 ms at 1M on v5e) then amortizes over
    # the ACTUAL drift rate — scenes far below the CFL bound rebuild every
    # tens of substeps rather than every K.  Mis-prediction is loud, not
    # silent: particles that leave the arena are deactivated and counted
    # (TileMap.dropped / kernel ok-mask).  ``rebucket_safety`` scales the
    # estimated next-step drift (next_dt * max_vel) to absorb acceleration
    # between substeps.  Multi-chip engines ignore this flag (their halo
    # margin/migration cadence is tied to the static rebucket_every).
    rebucket_auto: bool = False
    rebucket_safety: float = 2.0

    # --- Pallas kernel launch shape ---
    # Tiles processed per kernel program (grid step).  Amortizes the fixed
    # per-program cost (~1.8us measured on v5e) and lets the per-particle
    # material/SVD math batch over [chunk, tile]-shaped components, filling
    # the VPU's (8, 128) registers across sublanes instead of using one
    # sublane per [tile] vector.  Clamped to gcd(chunk, num_tiles) at call
    # time so any tile count stays valid.
    pallas_chunk: int = 8

    # Tiles per Pallas dispatch.  Models larger than this run the
    # gather -> kernel -> scatter pipeline in macro chunks under lax.scan.
    # With the oct-window pipeline the per-macro temporaries are only
    # 8 KB/tile (round 2's 32x-padded arena relayouts — 15.6 GB at 25M —
    # are gone); the lax.scan restacking costs real bandwidth (measured
    # ~1.5 ms at 1M round 3; 12 ms at 25M round 4 — 81k tiles fell off the
    # single-dispatch path at the old 64Ki default).  131072 tiles ≈ 2.1 GB
    # of window temporaries per dispatch — the bound only matters for
    # 100M-class models, which override it.
    pallas_macro_tiles: int = 131072

    @cached_property
    def precision(self):
        """jax.lax.Precision for the transfer contractions."""
        from jax.lax import Precision

        return {"highest": Precision.HIGHEST, "high": Precision.HIGH,
                "default": Precision.DEFAULT}[self.mxu_precision]

    @cached_property
    def arena_span(self) -> int:
        """Neighbor blocks per axis in the transfer arena.  The 2^3 arena
        tolerates one cell of drift (cells [4hb, 4hb+7] vs assignment-time
        base in [4hb+1, 4hb+4]), so K<=2 needs no widening; K>2 uses 4^3."""
        return 2 if self.rebucket_every <= 2 else 4

    @cached_property
    def arena_lo(self) -> int:
        """First arena block offset relative to the home block."""
        return 0 if self.rebucket_every <= 2 else -1

    @cached_property
    def arena_cells(self) -> int:
        return self.arena_span * self.block_size

    # ----- derived geometry -----
    @cached_property
    def domain_size(self) -> int:
        """Cells per axis (reference G_DOMAIN_SIZE)."""
        return 1 << self.domain_bits

    @cached_property
    def dx(self) -> float:
        return 1.0 / float(1 << self.domain_bits)

    @cached_property
    def dx_inv(self) -> float:
        return float(1 << self.domain_bits)

    @cached_property
    def d_inv(self) -> float:
        """APIC inertia-tensor inverse for quadratic B-splines: 4/dx^2
        (reference G_D_INV, settings.h:66)."""
        return 4.0 * self.dx_inv * self.dx_inv

    @cached_property
    def block_size(self) -> int:
        """Cells per block edge (reference G_BLOCKSIZE = 4)."""
        return 1 << self.block_bits

    @cached_property
    def block_volume(self) -> int:
        return self.block_size ** 3

    @cached_property
    def grid_size(self) -> int:
        """Blocks per axis (reference G_GRID_SIZE = 64 at 256^3)."""
        return 1 << (self.domain_bits - self.block_bits)

    @cached_property
    def num_table_entries(self) -> int:
        return self.grid_size ** 3

    @cached_property
    def null_block(self) -> int:
        """Block-address sentinel: first block of the null OCT row."""
        return self.null_oct * self.oct_z

    # ----- oct-packed grid pool (docs/design_octpool.md) -----
    # The grid pool stores 8 z-consecutive, z-aligned 4^3 blocks per native
    # (16, 128) TPU tile: rows (channel, cx), lanes (z8, cy, cz).  1 KB per
    # block with ZERO tile padding (a [4, 64] per-block row pads 4x), and
    # z-runs of active blocks become contiguous HBM windows — multi-row
    # window gathers run at 530 GB/s vs 15-150 GB/s for padded single rows
    # (measured on v5e, scripts/prof_dma.py).
    @cached_property
    def oct_z(self) -> int:
        """Blocks per pool row (z-major)."""
        return 8

    @cached_property
    def grid_size_zo(self) -> int:
        """Oct rows per z column."""
        return self.grid_size // self.oct_z

    @cached_property
    def num_oct_keys(self) -> int:
        return self.grid_size * self.grid_size * self.grid_size_zo

    @cached_property
    def max_active_octs(self) -> int:
        """Oct-row pool capacity.  Every active oct contains at least one
        active block, so max_active_blocks rows always suffice."""
        return self.max_active_blocks

    @cached_property
    def null_oct(self) -> int:
        """Pool row absorbing traffic for inactive octs."""
        return self.max_active_octs

    @cached_property
    def group_tiles(self) -> int:
        """Tiles per transfer group = one aligned home oct (8 z-blocks).
        The tile plan pads each oct's tile run to a multiple of this so a
        Pallas program serves whole groups with 4 two-oct window fetches."""
        return 8

    def tiles_for(self, num_particles: int) -> int:
        """Static tile capacity for a model of ``num_particles``.

        Each active block wastes at most (tile-1) slots of padding, so the
        bound is ceil(P/tile) + max_active_blocks; in practice far fewer
        blocks hold particles, so we use a cheaper heuristic with headroom.
        """
        if self.max_tiles:
            return self.max_tiles
        base = -(-num_particles // self.particle_tile)
        # every particle-occupied block wastes < 1 tile of padding; occupied
        # blocks ~ P/(ppc*block_volume) for a solid body; surface blocks are
        # partially filled, covered by the 1.2x margin + floor.  Highly
        # dispersed models (rare) should set max_tiles explicitly — the
        # TileMap.dropped diagnostic flags an overflow.
        blocks = max(64, int(1.1 * num_particles / (self.ppc * self.block_volume)))
        return base + min(blocks, self.max_active_blocks)

    def default_volume(self) -> float:
        """Per-particle volume at the nominal particles-per-cell."""
        return (self.dx ** 3) / self.ppc

    def frame_dt(self) -> float:
        return 1.0 / float(self.fps)

    def __post_init__(self):
        assert self.domain_bits > self.block_bits >= 1
        # the oct-packed pool layout assumes 4^3 blocks and >= 8 blocks/axis
        assert self.block_bits == 2, "grid pool layout requires 4^3 blocks"
        assert self.domain_bits - self.block_bits >= 3, (
            "domain must span >= 8 blocks (one pool oct) per axis"
        )
        assert self.max_active_blocks >= 1
        assert math.log2(self.particle_tile) == int(math.log2(self.particle_tile))
        # block keys ride through f32 bitcasts with bit 30 as a denormal
        # guard, so the flat block key space must stay below 2^30
        assert self.num_table_entries < (1 << 30), "domain too large for key packing"
        # drift tolerance of the 4^3 arena: ceil(K/2) + 1 cells on each side
        assert 1 <= self.rebucket_every <= 8, "rebucket_every must be in [1, 8]"
