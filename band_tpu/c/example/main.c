/* Minimal C client of the band-tpu C API (role-equivalent to the
 * reference's band/c/example/band_c_main.c): build a config, register a
 * model, run one sync and one async request, and check the output.
 *
 * Usage: main <model.tflite> [config.json]
 * The default inline config runs two CPU workers with a fixed-worker
 * scheduler; "add.tflite" computes y = 3*x, which the test asserts.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "band_c.h"

static volatile int g_callback_count = 0;
static volatile int g_log_count = 0;

static void on_end(void* user_data, int job_id, BandStatus status) {
  (void)user_data;
  (void)job_id;
  if (status == kBandOk) g_callback_count++;
}

static void on_log(BandLogSeverity severity, const char* msg) {
  (void)severity;
  (void)msg;
  g_log_count++;
}

int main(int argc, char** argv) {
  setvbuf(stdout, NULL, _IONBF, 0); /* keep prints on crash */
  if (argc < 2) {
    fprintf(stderr, "usage: %s <model.tflite> [config.json]\n", argv[0]);
    return 2;
  }

  BandSetLogSeverity(kBandLogDebug);
  int log_handle = BandSetLogReporter(on_log);
  printf("log_reporter=%d\n", log_handle >= 0);

  BandConfig* config = NULL;
  if (argc > 2) {
    config = BandConfigCreateFromFile(argv[2]);
  } else {
    BandConfigBuilder* b = BandConfigBuilderCreate();
    if (BandAddConfigJson(
            b,
            "{\"schedulers\": [\"fixed_worker\"],"
            " \"workers\": [{\"device\": \"cpu\", \"device_ids\": [0]},"
            "               {\"device\": \"cpu\", \"device_ids\": [1]}],"
            " \"profile_num_warmups\": 0, \"profile_num_runs\": 1}") !=
        kBandOk) {
      fprintf(stderr, "config error: %s\n", BandGetLastError());
      return 1;
    }
    /* exercise the dotted-key setter too */
    BandAddConfigKV(b, "planner.schedule_window_size", "8");
    config = BandConfigCreate(b);
    BandConfigBuilderDelete(b);
  }
  if (config == NULL) {
    fprintf(stderr, "config create failed: %s\n", BandGetLastError());
    return 1;
  }

  BandEngine* engine = BandEngineCreate(config);
  if (engine == NULL) {
    fprintf(stderr, "engine create failed: %s\n", BandGetLastError());
    return 1;
  }
  printf("num_workers=%d\n", BandEngineGetNumWorkers(engine));

  BandModel* model = BandModelCreate();
  if (BandModelAddFromFile(model, argv[1]) != kBandOk ||
      BandEngineRegisterModel(engine, model) != kBandOk) {
    fprintf(stderr, "register failed: %s\n", BandGetLastError());
    return 1;
  }

  int n_in = BandEngineGetNumInputTensors(engine, model);
  int n_out = BandEngineGetNumOutputTensors(engine, model);
  printf("inputs=%d outputs=%d\n", n_in, n_out);
  if (n_in < 1 || n_out < 1) return 1;

  BandTensor* in0 = BandEngineCreateInputTensor(engine, model, 0);
  BandTensor* out0 = BandEngineCreateOutputTensor(engine, model, 0);
  if (in0 == NULL || out0 == NULL) {
    fprintf(stderr, "tensor create failed: %s\n", BandGetLastError());
    return 1;
  }
  printf("in0 dims=%zu bytes=%zu type=%d\n", BandTensorGetNumDims(in0),
         BandTensorGetBytes(in0), (int)BandTensorGetType(in0));

  /* quantization introspection (affine for int8/uint8 models) */
  BandQuantizationType qt = BandTensorGetQuantizationType(in0);
  printf("quant_type=%d\n", (int)qt);
  if (qt == kBandAffineQuantization) {
    BandAffineQuantization* q =
        (BandAffineQuantization*)BandTensorGetQuantizationParams(in0);
    printf("quant num=%d scale0=%.6f zp0=%d dim=%d\n", q->num_params,
           q->scales[0], q->zero_points[0], q->quantized_dimension);
  }

  /* fill input with 2.0f (add.tflite is float32) */
  if (BandTensorGetType(in0) == kBandFloat32) {
    float* p = (float*)BandTensorGetData(in0);
    size_t n = BandTensorGetBytes(in0) / sizeof(float);
    for (size_t i = 0; i < n; ++i) p[i] = 2.0f;
  }

  int cb_handle = BandEngineSetOnEndRequest(engine, on_end, NULL);

  BandTensor* ins[1] = {in0};
  BandTensor* outs[1] = {out0};
  if (BandEngineRequestSync(engine, model, ins, outs) != kBandOk) {
    fprintf(stderr, "request failed: %s\n", BandGetLastError());
    return 1;
  }
  if (BandTensorGetType(out0) == kBandFloat32) {
    const float* q = (const float*)BandTensorGetData(out0);
    printf("sync out[0]=%f\n", q[0]);
  }

  /* async + wait, with an explicit option */
  BandRequestOption opt = BandRequestOptionGetDefault();
  opt.slo_us = 10 * 1000 * 1000; /* generous 10 s SLO */
  BandRequestHandle h =
      BandEngineRequestAsyncOptions(engine, model, opt, ins);
  if (h < 0) {
    fprintf(stderr, "async failed: %s\n", BandGetLastError());
    return 1;
  }
  if (BandEngineWait(engine, h, outs, 1) != kBandOk) {
    fprintf(stderr, "wait failed: %s\n", BandGetLastError());
    return 1;
  }
  if (BandTensorGetType(out0) == kBandFloat32) {
    const float* q = (const float*)BandTensorGetData(out0);
    printf("async out[0]=%f\n", q[0]);
  }
  printf("callbacks=%d\n", g_callback_count);

  /* unregistering stops further callbacks */
  if (BandEngineUnsetOnEndRequest(engine, cb_handle) != kBandOk) {
    fprintf(stderr, "unset callback failed: %s\n", BandGetLastError());
    return 1;
  }
  if (BandEngineRequestSync(engine, model, ins, outs) != kBandOk) {
    fprintf(stderr, "request after unset failed: %s\n", BandGetLastError());
    return 1;
  }
  printf("callbacks_after_unset=%d\n", g_callback_count);

  /* default-config engine: one worker per device + host worker */
  BandEngine* dflt = BandEngineCreateWithDefaultConfig();
  printf("default_engine=%d default_workers=%d\n", dflt != NULL,
         dflt != NULL ? BandEngineGetNumWorkers(dflt) : -1);
  BandEngineDelete(dflt);

  /* hot swap: unregister, then further requests must fail cleanly */
  if (BandEngineUnregisterModel(engine, model) != kBandOk) {
    fprintf(stderr, "unregister failed: %s\n", BandGetLastError());
    return 1;
  }
  int post = BandEngineRequestSync(engine, model, &in0, &out0);
  printf("unregistered=1 request_after_unregister_fails=%d\n",
         post != kBandOk);

  BandTensorDelete(in0);
  BandTensorDelete(out0);
  BandModelDelete(model);
  BandEngineDelete(engine);
  BandConfigDelete(config);
  BandUnsetLogReporter(log_handle);
  printf("C API OK\n");
  return 0;
}
