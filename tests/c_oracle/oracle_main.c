/* Headless oracle driver for the reference ray tracer.
 *
 * Links the REFERENCE's own scene.c / camera.c / vector.c / utils.c / os.c
 * and main.c (compiled with -Dmain=ref_main) straight out of
 * /root/reference, so `pixel()` (src/main.c:131-272) runs bit-for-bit the
 * reference estimator with its real RNG (src/utils.c:60-75), default
 * camera pose (src/camera.c:23-35) and scene parser. The only reference
 * code NOT linked is gpu_and_windowing.c (it needs glad/GLFW): this file
 * provides no-op window/event stubs plus a cubemap loader/sampler with the
 * documented semantics (src/gpu_and_windowing.c:24-112 — dominant-axis
 * face select, per-face u/v, [-1,1] clamp, nearest texel, bytes/255),
 * decoding the same JPEG assets with the same stb_image the reference
 * vendors.
 *
 * Usage:
 *   oracle <scene.txt> <W> <H> <spp> <out.f32> [skybox_dir | const R G B]
 *
 * Output: W*H*3 float32 (little-endian), row-major from v=1 (array row 0),
 * matching render_image's array orientation (pre-save flip).
 */

#include <math.h>
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define STB_IMAGE_IMPLEMENTATION
#define STBI_ONLY_JPEG
#include <stb/stb_image.h>

#include "scene.h"
#include "camera.h"
#include "gpu_and_windowing.h"

/* pose ops use the reference's own camera-state mutators */
extern void move_camera(Direction dir, float speed);
extern void rotate_camera(double mouse_x, double mouse_y);

/* ---- globals defined by the reference's main.c ---- */
extern Scene scene;
extern Cubemap skybox;
extern Vector3 pixel(float x, float y, float aspect_ratio);

/* ---- constant-sky override (bypasses the cubemap entirely) ---- */
static int have_const_sky = 0;
static Vector3 const_sky;

/* ---- window/event stubs (no GL, no GLFW) ---- */
void startup_window_and_opengl_context_or_exit(int w, int h, const char *t)
{ (void) w; (void) h; (void) t; }
void cleanup_window_and_opengl_context(void) {}
int get_screen_w(void) { return 0; }
int get_screen_h(void) { return 0; }
void move_frame_to_the_gpu(int w, int h, Vector3 *data)
{ (void) w; (void) h; (void) data; }
void draw_frame(void) {}
int pop_event(double *mx, double *my)
{ (void) mx; (void) my; return EVENT_CLOSE; }

/* ---- cubemap (behavior of src/gpu_and_windowing.c:24-112) ---- */
void load_cubemap(Cubemap *c, const char *files[6])
{
	for (int i = 0; i < 6; i++) {
		c->data[i] = stbi_load(files[i], &c->w, &c->h, &c->chan, 0);
		if (c->data[i] == NULL) {
			fprintf(stderr, "Couldn't load image '%s'\n", files[i]);
			abort();
		}
	}
}

void free_cubemap(Cubemap *c)
{
	for (int i = 0; i < 6; i++)
		stbi_image_free(c->data[i]);
}

Vector3 sample_cubemap(Cubemap *c, Vector3 dir)
{
	if (have_const_sky)
		return const_sky;

	float ax = absf(dir.x), ay = absf(dir.y), az = absf(dir.z);
	CubeFace face;
	float u, v;

	if (ax > ay && ax > az) {
		if (dir.x > 0) { face = CF_RIGHT; u = -dir.z / ax; v = -dir.y / ax; }
		else           { face = CF_LEFT;  u =  dir.z / ax; v = -dir.y / ax; }
	} else if (ay > ax && ay > az) {
		if (dir.y > 0) { face = CF_TOP;    u = dir.x / ay; v =  dir.z / ay; }
		else           { face = CF_BOTTOM; u = dir.x / ay; v = -dir.z / ay; }
	} else {
		if (dir.z > 0) { face = CF_FRONT; u =  dir.x / az; v = -dir.y / az; }
		else           { face = CF_BACK;  u = -dir.x / az; v = -dir.y / az; }
	}

	u = 0.5f * (clamp(u, -1, 1) + 1.0f);
	v = 0.5f * (clamp(v, -1, 1) + 1.0f);
	int x = u * (c->w - 1);
	int y = v * (c->h - 1);

	uint8_t *color = &c->data[face][(y * c->w + x) * c->chan];
	return (Vector3) {
		(float) color[0] / 255,
		(float) color[1] / 255,
		(float) color[2] / 255,
	};
}

/* Ray-probe mode: `oracle --trace <scene.txt>` reads "ox oy oz dx dy dz"
 * lines from stdin and prints the reference trace_ray result per ray —
 * for bounce-level parity debugging against the framework's trace(). */
static int trace_mode(const char *scene_file)
{
	if (!parse_scene_file((char *) scene_file, &scene)) {
		fprintf(stderr, "Couldn't parse scene\n");
		return 1;
	}
	double ox, oy, oz, dx, dy, dz;
	while (scanf("%lf %lf %lf %lf %lf %lf", &ox, &oy, &oz, &dx, &dy, &dz) == 6) {
		Ray r = { { (float) ox, (float) oy, (float) oz },
		          { (float) dx, (float) dy, (float) dz } };
		HitInfo h = trace_ray(r, &scene);
		printf("%d %.9g %.9g %.9g %.9g %.9g %.9g %.9g\n",
		       h.object, h.distance,
		       h.point.x, h.point.y, h.point.z,
		       h.normal.x, h.normal.y, h.normal.z);
		fflush(stdout);  /* line-oriented protocol when piped */
	}
	return 0;
}

/* Ray probe: read "u v aspect" lines, print the reference's own primary
 * ray (camera.c:95-125 with the default pose). */
static int ray_mode(void)
{
	double u, v, a;
	while (scanf("%lf %lf %lf", &u, &v, &a) == 3) {
		Ray r = ray_through_screen_at((float) u, (float) v, (float) a);
		printf("%.9g %.9g %.9g %.9g %.9g %.9g\n",
		       r.origin.x, r.origin.y, r.origin.z,
		       r.direction.x, r.direction.y, r.direction.z);
		fflush(stdout);
	}
	return 0;
}

int main(int argc, char **argv)
{
	if (argc >= 2 && strcmp(argv[1], "--ray") == 0)
		return ray_mode();
	if (argc >= 3 && strcmp(argv[1], "--trace") == 0)
		return trace_mode(argv[2]);
	if (argc < 6) {
		fprintf(stderr,
			"usage: %s <scene.txt> <W> <H> <spp> <out.f32> "
			"[skybox_dir | const R G B]\n", argv[0]);
		return 2;
	}
	const char *scene_file = argv[1];
	int W = atoi(argv[2]);
	int H = atoi(argv[3]);
	int spp = atoi(argv[4]);
	const char *out_path = argv[5];

	if (!parse_scene_file(scene_file, &scene)) {
		fprintf(stderr, "Couldn't parse scene\n");
		return 1;
	}

	char paths[6][512];
	int a = 6;
	if (argc > a && strcmp(argv[a], "const") == 0 && argc > a + 3) {
		have_const_sky = 1;
		const_sky = (Vector3) {
			(float) atof(argv[a + 1]), (float) atof(argv[a + 2]),
			(float) atof(argv[a + 3]),
		};
		a += 4;
	} else {
		const char *dir = "/root/reference/assets/skybox";
		if (argc > a && strcmp(argv[a], "rot") != 0 && strcmp(argv[a], "mov") != 0) {
			dir = argv[a];
			a++;
		}
		static const char *names[6] = {
			[CF_RIGHT] = "right", [CF_LEFT] = "left",
			[CF_TOP] = "top",     [CF_BOTTOM] = "bottom",
			[CF_FRONT] = "front", [CF_BACK] = "back",
		};
		const char *faces[6];
		for (int i = 0; i < 6; i++) {
			snprintf(paths[i], sizeof paths[i], "%s/%s.jpg", dir, names[i]);
			faces[i] = paths[i];
		}
		load_cubemap(&skybox, faces);
	}

	/* pose ops, applied in order through the reference's own camera code:
	 *   rot DX DY    mouse-look by DX px right / DY px up (the first rot
	 *                seeds rotate_camera's first_mouse tracking at (0,0),
	 *                which snaps front to yaw/pitch like the real app)
	 *   mov K SPEED  K in {w,s,a,d} -> UP/DOWN/LEFT/RIGHT move_camera
	 */
	double ax = 0.0, ay = 0.0;
	int seeded = 0;
	while (a < argc) {
		if (strcmp(argv[a], "rot") == 0 && a + 2 < argc) {
			if (!seeded) { rotate_camera(0.0, 0.0); seeded = 1; }
			ax += atof(argv[a + 1]);
			ay -= atof(argv[a + 2]);  /* dy is screen-up; y axis grows down */
			rotate_camera(ax, ay);
			a += 3;
		} else if (strcmp(argv[a], "mov") == 0 && a + 2 < argc) {
			Direction d_;
			switch (argv[a + 1][0]) {
				case 'w': d_ = UP; break;
				case 's': d_ = DOWN; break;
				case 'a': d_ = LEFT; break;
				default:  d_ = RIGHT; break;
			}
			move_camera(d_, (float) atof(argv[a + 2]));
			a += 3;
		} else {
			fprintf(stderr, "bad pose op at argv[%d]\n", a);
			return 2;
		}
	}

	double *acc = calloc((size_t) W * H * 3, sizeof(double));
	float aspect = (float) W / H;

	/* Same per-pixel u/v as render_column at scale 1 (src/main.c:293-296);
	 * one shared RNG stream marching across samples, as a single-threaded
	 * reference worker would. */
	for (int s = 0; s < spp; s++) {
		for (int j = 0; j < H; j++)
			for (int i = 0; i < W; i++) {
				float u = 1.0f - (float) i / (W - 1);
				float v = 1.0f - (float) j / (H - 1);
				Vector3 c = pixel(u, v, aspect);
				size_t p = ((size_t) j * W + i) * 3;
				acc[p + 0] += c.x;
				acc[p + 1] += c.y;
				acc[p + 2] += c.z;
			}
		if ((s + 1) % 16 == 0)
			fprintf(stderr, "%d/%d samples\n", s + 1, spp);
	}

	float *out = malloc((size_t) W * H * 3 * sizeof(float));
	for (size_t k = 0; k < (size_t) W * H * 3; k++)
		out[k] = (float) (acc[k] / spp);

	FILE *f = fopen(out_path, "wb");
	if (!f) { perror("fopen"); return 1; }
	fwrite(out, sizeof(float), (size_t) W * H * 3, f);
	fclose(f);
	fprintf(stderr, "wrote %s (%dx%d, %d spp)\n", out_path, W, H, spp);
	return 0;
}
