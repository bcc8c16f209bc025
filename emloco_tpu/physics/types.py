"""Engine configuration pytree."""
from __future__ import annotations

from flax import struct


class EngineConfig(struct.PyTreeNode):
    """Solver budget. Defaults mirror the reference's PhysX budget
    (pacer.yaml:93-104: dt=1/60, substeps 2, TGS, 4 position iters,
    controlFrequencyInv=2) → control dt = 1/30, physics dt = 1/120.
    All static (hashable) so they can close over jit.
    """

    control_dt: float = struct.field(pytree_node=False, default=1.0 / 30.0)
    # 2 implicit substeps per control step (dt = 1/60). The reference's PhysX
    # budget is dt=1/60 × 2 TGS substeps; our fully-implicit solve is
    # unconditionally stable and holds the same standing/tracking quality at
    # 1/60 as at 1/120 (see tests), so 2 is the default.
    n_substeps: int = struct.field(pytree_node=False, default=2)
    gravity: float = struct.field(pytree_node=False, default=-9.81)
    static_friction: float = struct.field(pytree_node=False, default=1.0)
    dynamic_friction: float = struct.field(pytree_node=False, default=1.0)
    linear_damping: float = struct.field(pytree_node=False, default=0.05)
    angular_damping: float = struct.field(pytree_node=False, default=0.05)
    # implicit contact model (reduced engine): normal spring/damper and
    # Coulomb-capped viscous friction. Stiffness set for PhysX-like rigidity:
    # ~3 mm penetration under body weight (755 N / 240 kN/m); at 40 kN/m the
    # passive rest pose visibly sank and slowly tipped over within ~3 s. The
    # fully-implicit solve is unconditionally stable at this stiffness.
    contact_stiffness: float = struct.field(pytree_node=False,
                                            default=240000.0)
    contact_damping: float = struct.field(pytree_node=False, default=2000.0)
    friction_vel_ref: float = struct.field(pytree_node=False, default=0.05)
    max_friction_damping: float = struct.field(pytree_node=False, default=4000.0)
    # intra-humanoid capsule-capsule contact over a fixed pair budget
    # (reference capability: PhysX self-collision via asset options,
    # humanoid.py:643-835). Off by default — locomotion rarely needs it;
    # enable for getup/fall training where limbs land on the trunk.
    self_contact: bool = struct.field(pytree_node=False, default=False)
    # mesh-geom ground contact (reference get_joint_geometries,
    # smpl_local_robot.py:83-146 per-beta mesh colliders): sample the ground
    # against BodyParams.mesh_points inscribed spheres (MESH_K per contact
    # body) instead of the two capsule end-spheres. Off by default — the
    # capsule table is the PD-locomotion workhorse at 1/3 the contact rows.
    mesh_contacts: bool = struct.field(pytree_node=False, default=False)
    # depenetration clamp (PhysX maxDepenetrationVelocity analog): the spring
    # force sees at most this penetration, so a deep single-substep impact
    # can't inject unbounded energy through the explicit RHS term
    max_depenetration: float = struct.field(pytree_node=False, default=0.02)
    # velocity clamps (PhysX maxLinearVelocity / maxAngularVelocity): the
    # velocity-product and gyroscopic RHS terms are explicit and quadratic in
    # velocity — without a cap, one kicked env can spiral v→ω→v to inf and
    # poison batch statistics with NaN
    max_linear_velocity: float = struct.field(pytree_node=False, default=50.0)
    max_angular_velocity: float = struct.field(pytree_node=False,
                                               default=60.0)
    # block-arrow (supernodal) Cholesky exploiting the tree's branch-induced
    # sparsity — exact, ~5× fewer solver flops than the dense factorization;
    # disable to fall back to the dense Pallas kernel
    blocked_solver: bool = struct.field(pytree_node=False, default=True)
    # TGS-style step: freeze Jacobians / contact set / LHS factorization at
    # the step start and reuse across substeps, rebuilding only the RHS —
    # the same once-per-step Jacobian approximation PhysX TGS makes
    # (pacer.yaml:94-99). False = fully re-assembled implicit substeps.
    tgs_step: bool = struct.field(pytree_node=False, default=True)
    # store the merged Jacobian row tensors (G, W, t2m, Gc, Jn) in bfloat16:
    # the factor chain is HBM-bound on these (N,·,72) arrays (measured 6.9 ms
    # = 74% of the 9.35 ms step at 4,096 envs, scripts/merge_attribution.py)
    # and TPU matmuls already compute in bf16 with f32 accumulation, so
    # halving row storage halves the chain's memory traffic. Penetrations,
    # forces, the assembled LHS/RHS, and the solve stay float32; rows carry
    # ~0.4% relative rounding — the same order as PhysX's f32 iterative
    # solver tolerances. Equivalence vs the 4-D f32 oracle is pinned with
    # rows_bf16=False; physics-quality invariants (standing force, energy)
    # are pinned WITH it on (tests/test_engine.py).
    rows_bf16: bool = struct.field(pytree_node=False, default=True)
    # contact-path terrain lookup through a per-env corner-texture window of
    # this many cells (0 = direct global gather): one dynamic-slice row per
    # env + one-hot interpolation matmuls replace one gather row per contact
    # point (TPU gathers charge per row). Exact while contact points stay
    # within ~(patch/2)·cell of the root — 1.6 m at the default 0.1 m cells,
    # vs the humanoid's ~1.2 m reach; farther points clamp to the window
    # edge (such states are termination-bound ragdoll flights).
    terrain_patch: int = struct.field(pytree_node=False, default=0)
    # assemble the LHS/RHS in batch-major (N, 75, 75)/(N, 75) — the layouts
    # XLA's batched dot emits natively — and let the Pallas solver fuse the
    # env-last relayout its lane math needs into its in-VMEM permute. Kills
    # the HBM round-trip of the (75,75,N) transpose that the env-last
    # emission otherwise pays after the Gram matmul. Only meaningful with
    # blocked_solver (the SoA kernel has no batch-major entry; without
    # Pallas the jnp fallback natively wants batch-major anyway).
    batch_major_solver: bool = struct.field(pytree_node=False, default=False)
    # emit the merged LHS with the Pallas gram_diag kernel instead of XLA's
    # batched einsum: one MXU dot per env streamed through VMEM, diag
    # fused; the env-last solver layout comes from the chunked Pallas
    # to_env_last relayout rather than XLA's transpose. Pallas backends
    # only (the einsum is the fallback elsewhere). Measured OFF at 4,096
    # envs: the kernels are fast in isolation (1.04 + 0.75 ms vs ~3.0 ms
    # for XLA's chain) but the custom-call boundary restructures the whole
    # step graph (+420 HLO ops, step 6.1 → 21 ms) — see RESULTS.md r4.
    gram_kernel: bool = struct.field(pytree_node=False, default=False)
    # contract the merged LHS as (√w∘R)ᵀ(√w∘R) — ONE operand instead of
    # (w∘R, R): halves the row materialization and dedups the pre-dot
    # layout copies XLA inserts (measured 2×0.5 ms of the 3.0 ms LHS chain
    # at 4,096 envs), and makes the Gram term exactly PSD. Requires every
    # row weight ≥ 0, i.e. dt·k_n + d_n ≥ max_friction_damping — checked
    # statically; configs violating it fall back to the two-operand form.
    # Measured: step 6.15 → 5.38 ms at 4,096 envs (scripts/step_bench.py).
    sqrt_gram: bool = struct.field(pytree_node=False, default=True)

    @property
    def substep_dt(self) -> float:
        return self.control_dt / self.n_substeps
