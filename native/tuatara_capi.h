/* C ABI for the tuatara-tpu OCR engine.
 *
 * Surface parity with the reference's C++ library API (tuatara.h:8-13:
 * `std::vector<OutputItem> image_to_data(cv::Mat, std::string weights_dir,
 * std::string outputs_dir)`), redesigned as a plain C ABI so any language
 * can link it: fixed-size output records, caller-owned buffers, thread-safe
 * error reporting.
 *
 * The engine itself is the JAX/XLA program pipeline; this shim embeds a
 * CPython interpreter on first call (or joins the already-running one when
 * loaded inside a Python process) and routes through the public
 * `tuatara_tpu.image_to_data` entry point, so C callers get the identical
 * pipeline, engine caching included.
 */

#ifndef TUATARA_CAPI_H_
#define TUATARA_CAPI_H_

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
  char text[256];   /* UTF-8, NUL-terminated (truncated if longer) */
  float bbox[4];    /* x0, y0, x1, y1 — tesseract format (tuatara.cpp:256) */
  float confidence; /* sequence probability in [0, 1] */
} TuataraItem;

/* OCR an interleaved uint8 image (channels = 1 grayscale or 3 RGB; row-major
 * [height][width][channels]). Writes up to max_items records into out.
 * Returns the number of items written, or -1 on error (see
 * tuatara_last_error). weights_dir may be NULL or "" for randomly
 * initialized weights (smoke testing); outputs_dir is accepted for
 * reference-signature parity and ignored (tuatara.cpp:320-323). */
int tuatara_image_to_data(const unsigned char* image, int height, int width,
                          int channels, const char* weights_dir,
                          const char* outputs_dir, TuataraItem* out,
                          int max_items);

/* Message for the last error on this thread ("" if none). */
const char* tuatara_last_error(void);

#ifdef __cplusplus
}
#endif

#endif /* TUATARA_CAPI_H_ */
