// Timing harness for the reference solver's hot steps (links the
// reference's own objects; initialization approximated: uniform rho,
// Poiseuille velocity, per-type C/D like main.cpp).
#include "config.h"
#include "grid.h"
#include "fields.h"
#include "grains.h"
#include "pd_ns.h"
#include "pd_ard_implicit.h"
#include "boundary.h"
#include <chrono>
#include <cstdio>
#include <omp.h>

using Clock = std::chrono::steady_clock;
static double secs(Clock::time_point a, Clock::time_point b) {
    return std::chrono::duration<double>(b - a).count();
}

int main(int argc, char** argv) {
    Config cfg;
    cfg.load(argc > 1 ? argv[1] : "config/params.cfg");
    cfg.compute_derived();

    Grid grid;
    grid.build(cfg);
    grid.build_neighbors();
    GrainStructure grains;
    grains.generate(grid, cfg);

    Fields f;
    f.allocate(grid.N_total);
    for (int i = 0; i < grid.N_total; ++i) {
        double x = grid.pos[i][0];
        double r2 = (DIM == 2) ? x * x : x * x + grid.pos[i][1] * grid.pos[i][1];
        double prof = 1.0 - r2 / (cfg.R_tube * cfg.R_tube);
        switch (grid.node_type[i]) {
            case FLUID: case INLET: case OUTLET:
                f.rho[i] = cfg.rho_f; f.C[i] = cfg.C_liquid_init;
                f.D_map[i] = cfg.D_liquid; f.phase[i] = 1;
                f.vel[i][DIM - 1] = ((DIM == 2) ? 1.5 : 2.0) * cfg.U_in * prof;
                break;
            case SOLID_MG:
                f.rho[i] = cfg.rho_f; f.C[i] = cfg.C_solid_init;
                f.D_map[i] = grains.is_grain_boundary[i] ? cfg.D_gb : cfg.D_grain;
                f.phase[i] = 0;
                break;
            default:
                f.rho[i] = cfg.rho_f;
        }
        f.rho_new[i] = f.rho[i]; f.C_new[i] = f.C[i]; f.vel_new[i] = f.vel[i];
        f.is_gb[i] = grains.is_grain_boundary[i];
        f.is_precip[i] = grains.is_precipitate[i];
    }

    printf("N_total=%d threads=%d\n", grid.N_total, omp_get_max_threads());

    PD_NS_Solver ns;
    ns.init(grid, cfg);
    double dt = ns.compute_dt(f, grid, cfg);

    // warm + time NS steps (with the BCs the steady loop applies)
    auto bcs = [&]() {
        apply_inlet_bc(f, grid, cfg);
        apply_outlet_bc(f, grid, cfg);
        apply_wall_bc(f, grid, cfg);
        apply_solid_surface_bc(f, grid);
    };
    bcs(); ns.step(f, grid, cfg, dt); f.swap_buffers();
    int NS_IT = 10;
    auto t0 = Clock::now();
    for (int it = 0; it < NS_IT; ++it) {
        bcs();
        ns.step(f, grid, cfg, dt);
        apply_wall_bc_new(f, grid, cfg);
        f.swap_buffers();
    }
    auto t1 = Clock::now();
    printf("ns_iter_ms=%.2f\n", secs(t0, t1) / NS_IT * 1e3);

    PD_ARD_ImplicitSolver ard;
    ard.init(grid, cfg);
    ard.set_volume_loss(0.0);
    t0 = Clock::now();
    ard.assemble(f, grid, cfg);
    t1 = Clock::now();
    printf("assemble_s=%.3f\n", secs(t0, t1));

    double dtc = ard.compute_adaptive_dt(f, grid, cfg);
    printf("adaptive_dt=%.3e\n", dtc);
    int ARD_IT = 3;
    t0 = Clock::now();
    for (int it = 0; it < ARD_IT; ++it) {
        apply_inlet_bc(f, grid, cfg);
        apply_outlet_bc(f, grid, cfg);
        apply_wall_concentration_bc(f, grid, cfg);
        ard.step(f, grid, cfg, dtc);
        smooth_boundary_concentration(f, grid, cfg);
    }
    t1 = Clock::now();
    printf("implicit_step_s=%.3f\n", secs(t0, t1) / ARD_IT);
    return 0;
}
