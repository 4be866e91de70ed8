// Native mesh mass-properties kernel.
//
// Computes volume, center of mass and the unit-density inertia tensor (about
// the COM) of a closed triangle mesh via divergence-theorem accumulation of
// signed tetrahedra against the origin — the quantities the reference
// obtains from Chrono's ChBodyEasyMesh for its demo bodies
// (reference: demos/sphere/demo_sphere_decay.cpp:68-79 and analogues).
//
// Build: make -C hydrochrono_tpu/native   (produces libmeshprops.so)
// ABI:   int mesh_mass_properties(const double* verts, int n_verts,
//                                 const int* faces, int n_faces,
//                                 double out[13])
//        out = [volume, com_xyz(3), inertia_3x3_row_major(9)]
//        returns 0 on success, nonzero on degenerate input.

#include <cmath>
#include <cstring>

extern "C" int mesh_mass_properties(const double* verts, int n_verts,
                                    const int* faces, int n_faces,
                                    double* out) {
    if (n_verts < 4 || n_faces < 4 || !verts || !faces || !out) return 1;

    double vol6_total = 0.0;
    double com_acc[3] = {0.0, 0.0, 0.0};
    double C[3][3];  // covariance-style second-moment accumulator
    std::memset(C, 0, sizeof(C));

    for (int f = 0; f < n_faces; ++f) {
        const int ia = faces[3 * f + 0];
        const int ib = faces[3 * f + 1];
        const int ic = faces[3 * f + 2];
        if (ia < 0 || ib < 0 || ic < 0 || ia >= n_verts || ib >= n_verts || ic >= n_verts)
            return 2;
        const double* a = verts + 3 * ia;
        const double* b = verts + 3 * ib;
        const double* c = verts + 3 * ic;

        // 6 * signed volume of tet (0, a, b, c)
        const double cx = b[1] * c[2] - b[2] * c[1];
        const double cy = b[2] * c[0] - b[0] * c[2];
        const double cz = b[0] * c[1] - b[1] * c[0];
        const double v6 = a[0] * cx + a[1] * cy + a[2] * cz;
        vol6_total += v6;

        for (int j = 0; j < 3; ++j)
            com_acc[j] += v6 * (a[j] + b[j] + c[j]);

        // second moments of the tet: C += v6/120 * sum_{m,n} p_m p_n^T (1+delta_mn)
        const double* p[3] = {a, b, c};
        for (int j = 0; j < 3; ++j) {
            for (int k = 0; k < 3; ++k) {
                double s = 0.0;
                for (int m = 0; m < 3; ++m)
                    for (int n = 0; n < 3; ++n)
                        s += p[m][j] * p[n][k] * (m == n ? 2.0 : 1.0);
                C[j][k] += v6 / 120.0 * s;
            }
        }
    }

    const double volume = vol6_total / 6.0;
    if (std::fabs(volume) < 1e-300) return 3;

    double com[3];
    for (int j = 0; j < 3; ++j) com[j] = com_acc[j] / (24.0 * volume);

    // inertia about origin: I = trace(C) Id - C; shift to COM
    double inertia[3][3];
    const double trC = C[0][0] + C[1][1] + C[2][2];
    for (int j = 0; j < 3; ++j)
        for (int k = 0; k < 3; ++k)
            inertia[j][k] = (j == k ? trC : 0.0) - C[j][k];

    const double r2 = com[0] * com[0] + com[1] * com[1] + com[2] * com[2];
    for (int j = 0; j < 3; ++j)
        for (int k = 0; k < 3; ++k)
            inertia[j][k] -= volume * ((j == k ? r2 : 0.0) - com[j] * com[k]);

    out[0] = volume;
    out[1] = com[0];
    out[2] = com[1];
    out[3] = com[2];
    for (int j = 0; j < 3; ++j)
        for (int k = 0; k < 3; ++k)
            out[4 + 3 * j + k] = inertia[j][k];
    return 0;
}
