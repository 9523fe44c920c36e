/* Dependency-free CPU baseline for BASELINE.md / bench.py vs_baseline.
 *
 * Measures what the reference tracer can actually do on THIS machine: the
 * scene4.lol pipeline (march 256 steps / eps 1e-3 / max_dist 100, 128-step
 * soft shadows with w=50 and the full-unit origin bias, tetrahedron normals
 * with h = dist/100, two-light Phong, gamma 1/2.2 — the semantics of
 * naive_renderer.c:46-235, independently transcribed from the repo's golden
 * oracle loltracer_tpu/golden/tracer.py) with the scene SDF statically
 * compiled at -O3. Static compilation is an upper bound on the reference's
 * DynASM JIT backend (tracing_jit_renderer.dasc compiles exactly this SDF
 * to x86 at runtime; the C compiler does the same job with a global
 * optimizer), and the scanline thread pool mirrors the reference's worker
 * model (naive_renderer.c:195-240). No SDL/flex/bison needed: scene4's
 * parsed geometry (deg->rad fov, normalized camera direction per
 * scene.c:140-264) is hardcoded below.
 *
 * Usage: cpu_baseline WIDTH HEIGHT REPS THREADS [DUMP.f32]
 * Prints one JSON line: {"rays_per_s": N, "threads": T, ...}.
 * DUMP.f32 = raw float32 RGB (H*W*3) of the last frame, for the parity
 * test against the float64 golden oracle (tests/test_cpu_baseline.py).
 */
#include <math.h>
#include <pthread.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef struct { float x, y, z; } v3;

static inline v3 v3add(v3 a, v3 b) { return (v3){a.x+b.x, a.y+b.y, a.z+b.z}; }
static inline v3 v3sub(v3 a, v3 b) { return (v3){a.x-b.x, a.y-b.y, a.z-b.z}; }
static inline v3 v3scale(v3 a, float s) { return (v3){a.x*s, a.y*s, a.z*s}; }
static inline float v3dot(v3 a, v3 b) { return a.x*b.x + a.y*b.y + a.z*b.z; }
static inline v3 v3cross(v3 a, v3 b) {
    return (v3){a.y*b.z - a.z*b.y, a.z*b.x - a.x*b.z, a.x*b.y - a.y*b.x};
}
static inline v3 v3norm(v3 a) {
    float n = sqrtf(v3dot(a, a));
    return v3scale(a, 1.0f / n);
}

/* SSE-semantics min/max (reference float.h:6-14: return the second operand
 * when either input is NaN; `a < b ? a : b` compiles to exactly that). */
static inline float minf(float a, float b) { return a < b ? a : b; }
static inline float maxf(float a, float b) { return a > b ? a : b; }
static inline float clampf(float v, float lo, float hi) {
    return minf(maxf(v, lo), hi);
}
static inline float sminf(float a, float b, float k) {
    float h = clampf(0.5f + 0.5f * (b - a) / k, 0.0f, 1.0f);
    return (b + (a - b) * h) - k * h * (1.0f - h);
}

/* --- scene4.lol, parsed (deg->rad, normalized direction) --- */
#define NSPH 5
static const v3 SPH_P[NSPH] = {
    {0, 1, -6}, {-1, 0.5f, -3}, {-3, 4.5f, -3}, {2, 2, -10}, {6, 2, -10},
};
static const float SPH_R[NSPH] = {1, 3, 0.5f, 2, 5};
static const float SMOOTH_K = 3.0f;
static const float PLANE_Y = -1.0f;

#define NLIGHT 2
static const v3 LIGHT_P[NLIGHT] = {{-2, 10, -1}, {-7, 2, -5}};
static const v3 LIGHT_DIFF[NLIGHT] = {{4, 4, 4}, {1, 1.5f, 2}};
static const v3 LIGHT_SPEC[NLIGHT] = {{4, 4, 4}, {1, 1.5f, 2}};

static const v3 CAM_POINT = {-2, 6, 3};
static const v3 CAM_DIR_RAW = {0.3f, -0.7f, -1};
static const float FOV_DEG = 150.0f;
static const v3 AMBIENT_COLOR = {0.03f, 0.03f, 0.03f};

/* materials: id 0 = miss (all zero), 1 = blob, 2 = floor */
static const float MAT_SHINY[3] = {0, 16, 25};
static const v3 MAT_DIFF[3] = {{0,0,0}, {0.15f,0.22f,0.19f}, {0.04f,0.03f,0.02f}};
static const v3 MAT_SPEC[3] = {{0,0,0}, {0.08f,0.08f,0.08f}, {0.05f,0.05f,0.05f}};
static const v3 MAT_AMB[3]  = {{0,0,0}, {0.15f,0.22f,0.19f}, {0.04f,0.03f,0.02f}};

#define MAX_STEPS 256
#define EPSILON 1e-3f
#define MAX_DIST 100.0f
#define SHADOW_STEPS 128
#define SHADOW_W 50.0f
#define SHADOW_OFFSET 1.0f
#define GAMMA (1.0f / 2.2f)

static inline float sd_sphere(v3 p, v3 c, float r) {
    v3 d = v3sub(p, c);
    return sqrtf(v3dot(d, d)) - r;
}

/* scene4's object tree: smooth-union(smooth-union(s0, s1),
 * smooth-union(s2, smooth-union(s3, s4))), then the plane; first-wins
 * strict < argmin over the two top-level objects (naive_renderer.c:30-44).
 * Returns distance; *id = 0 none, 1 blob, 2 plane. */
static inline float scene_sdf(v3 p, int *id) {
    float d0 = sd_sphere(p, SPH_P[0], SPH_R[0]);
    float d1 = sd_sphere(p, SPH_P[1], SPH_R[1]);
    float d2 = sd_sphere(p, SPH_P[2], SPH_R[2]);
    float d3 = sd_sphere(p, SPH_P[3], SPH_R[3]);
    float d4 = sd_sphere(p, SPH_P[4], SPH_R[4]);
    float blob = sminf(sminf(d0, d1, SMOOTH_K),
                       sminf(d2, sminf(d3, d4, SMOOTH_K), SMOOTH_K),
                       SMOOTH_K);
    float plane = p.y - PLANE_Y;
    float best = INFINITY;
    int bid = 0;
    if (blob < best) { best = blob; bid = 1; }
    if (plane < best) { best = plane; bid = 2; }
    *id = bid;
    return best;
}

static inline float march(v3 ro, v3 rd, int *obj_id) {
    int id = 0;
    float t = 0.0f;
    for (int i = 0; i < MAX_STEPS; i++) {
        v3 p = v3add(ro, v3scale(rd, t));
        float d = scene_sdf(p, &id);
        t += d;
        if (d < EPSILON || t > MAX_DIST) break;
    }
    if (t >= MAX_DIST) id = 0;
    *obj_id = id;
    return t;
}

static inline float soft_shadow(v3 ro, v3 rd, float max_dist) {
    float res = 1.0f;
    float t = 0.0f;
    int id;
    for (int i = 0; i < SHADOW_STEPS; i++) {
        v3 p = v3add(ro, v3scale(rd, t));
        float d = scene_sdf(p, &id);
        /* first iteration divides by t = 0 -> +/-inf, kept on purpose
         * (naive_renderer.c:83 quirk) */
        res = minf(res, SHADOW_W * d / t);
        t += d;
        if (res < -1.0f || t > max_dist) break;
    }
    return maxf(res, 0.0f);
}

static inline v3 get_normal(v3 p, float dist) {
    static const v3 ks[4] = {
        {1, -1, -1}, {-1, -1, 1}, {-1, 1, -1}, {1, 1, 1}};
    float h = dist / 100.0f;  /* naive_renderer.c:114-125 */
    v3 n = {0, 0, 0};
    int id;
    for (int i = 0; i < 4; i++) {
        v3 q = v3add(p, v3scale(ks[i], h));
        n = v3add(n, v3scale(ks[i], scene_sdf(q, &id)));
    }
    return v3norm(n);
}

static inline v3 shade(v3 p, v3 n, int obj_id) {
    /* object -> material: blob = 1, plane = 2, miss = 0 */
    int mat = obj_id == 1 ? 1 : (obj_id == 2 ? 2 : 0);
    v3 total = {0, 0, 0};
    for (int li = 0; li < NLIGHT; li++) {
        v3 to_light = v3sub(LIGHT_P[li], p);
        float light_dist = sqrtf(v3dot(to_light, to_light));
        v3 ldir = v3norm(to_light);
        v3 so = v3add(p, v3scale(ldir, SHADOW_OFFSET));
        float shadow = soft_shadow(so, ldir, light_dist);

        float diff_inc = clampf(v3dot(n, ldir), 0.0f, 1.0f);
        v3 dterm = v3scale(LIGHT_DIFF[li], shadow * diff_inc);
        total = v3add(total, (v3){dterm.x * MAT_DIFF[mat].x,
                                  dterm.y * MAT_DIFF[mat].y,
                                  dterm.z * MAT_DIFF[mat].z});

        v3 refl = v3sub(v3scale(n, 2.0f * v3dot(ldir, n)), ldir);
        v3 cdir = v3norm(v3sub(CAM_POINT, p));
        float base = clampf(v3dot(refl, cdir), 0.0f, 1.0f);
        /* powf(0,0) == 1, matching C powf (naive_renderer.c:158-161) */
        float spec_inc = diff_inc * powf(base, MAT_SHINY[mat]);
        v3 sterm = v3scale(LIGHT_SPEC[li], shadow * spec_inc);
        total = v3add(total, (v3){sterm.x * MAT_SPEC[mat].x,
                                  sterm.y * MAT_SPEC[mat].y,
                                  sterm.z * MAT_SPEC[mat].z});
    }
    total = v3add(total, (v3){AMBIENT_COLOR.x * MAT_AMB[mat].x,
                              AMBIENT_COLOR.y * MAT_AMB[mat].y,
                              AMBIENT_COLOR.z * MAT_AMB[mat].z});
    return (v3){clampf(total.x, 0, 1), clampf(total.y, 0, 1),
                clampf(total.z, 0, 1)};
}

typedef struct {
    int width, height, row0, row1;
    v3 right_dir, up_dir, cam_dir;
    float half_w, half_h;
    float *out;  /* H*W*3, may be NULL */
    double checksum;
} job_t;

static void *render_rows(void *arg) {
    job_t *j = (job_t *)arg;
    double acc = 0.0;
    for (int y = j->row0; y < j->row1; y++) {
        float view_y = 1.0f - (y + 0.5f) / j->height * 2.0f;
        for (int x = 0; x < j->width; x++) {
            float view_x = (x + 0.5f) / j->width * 2.0f - 1.0f;
            v3 rd = v3add(v3add(v3scale(j->right_dir, view_x * j->half_w),
                                v3scale(j->up_dir, view_y * j->half_h)),
                          j->cam_dir);
            rd = v3norm(rd);
            int obj_id;
            float t = march(CAM_POINT, rd, &obj_id);
            v3 p = v3add(CAM_POINT, v3scale(rd, t));
            v3 n = get_normal(p, t);
            v3 c = shade(p, n, obj_id);
            c = (v3){powf(c.x, GAMMA), powf(c.y, GAMMA), powf(c.z, GAMMA)};
            acc += c.x + c.y + c.z;
            if (j->out) {
                float *px = j->out + ((size_t)y * j->width + x) * 3;
                px[0] = c.x; px[1] = c.y; px[2] = c.z;
            }
        }
    }
    j->checksum = acc;
    return NULL;
}

static double now_s(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int main(int argc, char **argv) {
    int width = argc > 1 ? atoi(argv[1]) : 1920;
    int height = argc > 2 ? atoi(argv[2]) : 1080;
    int reps = argc > 3 ? atoi(argv[3]) : 3;
    int threads = argc > 4 ? atoi(argv[4]) : 1;
    const char *dump = argc > 5 ? argv[5] : NULL;

    /* camera basis (golden get_camera_ray; atan-of-half-fov quirk,
     * naive_renderer.c:183) */
    v3 cam_dir = v3norm(CAM_DIR_RAW);
    float fov_rad = FOV_DEG * (float)(M_PI / 180.0);
    float half_h = atanf(fov_rad / 2.0f);
    float half_w = (float)width / (float)height * half_h;
    v3 up_guide = {0, 1, 0};
    v3 right_dir = v3norm(v3cross(cam_dir, up_guide));
    v3 up_dir = v3cross(right_dir, cam_dir);

    float *out = dump ? malloc((size_t)width * height * 3 * sizeof(float))
                      : NULL;
    pthread_t *tids = malloc(threads * sizeof(pthread_t));
    job_t *jobs = malloc(threads * sizeof(job_t));

    double best = INFINITY, checksum = 0.0;
    for (int rep = 0; rep < reps; rep++) {
        double t0 = now_s();
        int rows_per = (height + threads - 1) / threads;
        for (int i = 0; i < threads; i++) {
            jobs[i] = (job_t){width, height,
                              i * rows_per,
                              (i + 1) * rows_per < height ? (i + 1) * rows_per
                                                          : height,
                              right_dir, up_dir, cam_dir, half_w, half_h,
                              out, 0.0};
            pthread_create(&tids[i], NULL, render_rows, &jobs[i]);
        }
        checksum = 0.0;
        for (int i = 0; i < threads; i++) {
            pthread_join(tids[i], NULL);
            checksum += jobs[i].checksum;
        }
        double dt = now_s() - t0;
        if (dt < best) best = dt;
    }

    if (dump && out) {
        FILE *f = fopen(dump, "wb");
        fwrite(out, sizeof(float), (size_t)width * height * 3, f);
        fclose(f);
    }

    double rays = (double)width * height;
    printf("{\"metric\": \"cpu_baseline scene4 %dx%d\", "
           "\"rays_per_s\": %.1f, \"threads\": %d, \"reps\": %d, "
           "\"best_frame_s\": %.4f, \"checksum\": %.6e}\n",
           width, height, rays / best, threads, reps, best, checksum);
    free(tids); free(jobs); free(out);
    return 0;
}
