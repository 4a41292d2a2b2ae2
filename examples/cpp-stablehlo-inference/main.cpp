// Standalone C++ consumer of the framework's `.stablehlo` export.
//
// Counterpart of the reference's native inference examples
// (/root/reference/examples/YOLOv8-CPP-Inference/inference.cpp:185 and the
// ONNXRuntime C++/Rust apps): proves the exported artifact runs END TO END
// outside Python. It
//   1. reads <stem>.stablehlo (MLIR text lowered by engine/exporter.py),
//   2. parses + converts it to an XlaComputation
//      (xla::ParseMlirModuleStringAndConvertToXlaComputation),
//   3. compiles it with the XLA PjRt CPU client (xla::GetXlaPjrtCpuClient) —
//      the exact same runtime stack a TPU deployment uses via libtpu's PJRT
//      plugin, just a different client factory,
//   4. feeds the <stem>.weights.bin leaves (manifest <stem>.weights.json,
//      already in @main argument order) plus a raw uint8 image,
//   5. executes and dumps every output tensor to out_<i>.bin, printing
//      detections when the export embedded NMS ((B,max_det,6) + n_valid).
//
// Build: ./build.sh   (links against the tensorflow wheel's libtensorflow_cc,
// which exports the XLA PjRt CPU client + MLIR->HLO conversion).
// Run:   ./stablehlo_infer <stem> <image.bin> [conf]
//   <stem>      path prefix of the export (stem.stablehlo / stem.weights.*)
//   <image.bin> raw uint8 NHWC bytes matching the manifest's image_input

#include <csignal>
#include <new>
#include <unistd.h>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <execinfo.h>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

#include "xla/hlo/builder/xla_computation.h"
#include "xla/literal.h"
#include "xla/pjrt/pjrt_client.h"
#include "xla/pjrt/plugin/xla_cpu/cpu_client_options.h"
#include "xla/pjrt/plugin/xla_cpu/xla_cpu_pjrt_client.h"

namespace xla {
// Declared manually: the wheel exports this symbol from libtensorflow_cc but
// ships no MLIR headers (xla/pjrt/mlir_to_hlo.h includes mlir/IR/...). The
// exported signature uses std::string_view (absl aliases it under C++17).
absl::Status ParseMlirModuleStringAndConvertToXlaComputation(
    std::string_view mlir_module_str, XlaComputation& xla_computation,
    bool use_tuple_args, bool return_tuple);
}  // namespace xla

namespace {

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    fprintf(stderr, "cannot open %s\n", path.c_str());
    exit(2);
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

// Minimal JSON reader for the exporter's manifest schema (flat objects with
// string / int / int-array values; no escapes in our keys/values).
struct Arg {
  std::string name, dtype;
  std::vector<int64_t> shape;
  int64_t offset = 0, nbytes = 0;
};

struct Manifest {
  std::vector<Arg> args;
  std::vector<int64_t> image_shape;
  bool nms = false;
};

void SkipWs(const std::string& s, size_t& i) {
  while (i < s.size() && (s[i] == ' ' || s[i] == '\n' || s[i] == '\t' || s[i] == '\r' || s[i] == ',')) i++;
}

std::string ParseString(const std::string& s, size_t& i) {
  i = s.find('"', i) + 1;
  size_t e = s.find('"', i);
  std::string out = s.substr(i, e - i);
  i = e + 1;
  return out;
}

int64_t ParseInt(const std::string& s, size_t& i) {
  SkipWs(s, i);
  size_t e = i;
  while (e < s.size() && (isdigit(s[e]) || s[e] == '-')) e++;
  int64_t v = strtoll(s.substr(i, e - i).c_str(), nullptr, 10);
  i = e;
  return v;
}

std::vector<int64_t> ParseIntArray(const std::string& s, size_t& i) {
  std::vector<int64_t> out;
  i = s.find('[', i) + 1;
  while (true) {
    SkipWs(s, i);
    if (s[i] == ']') {
      i++;
      break;
    }
    out.push_back(ParseInt(s, i));
  }
  return out;
}

Manifest ParseManifest(const std::string& js) {
  Manifest m;
  size_t i = js.find("\"args\"");
  i = js.find('[', i) + 1;
  while (true) {
    size_t obj = js.find('{', i);
    size_t close = js.find(']', i);
    if (obj == std::string::npos || close < obj) break;
    Arg a;
    size_t j = obj;
    while (js[j] != '}') {
      SkipWs(js, j);
      if (js[j] == '{') {
        j++;
        continue;
      }
      std::string key = ParseString(js, j);
      j = js.find(':', j) + 1;
      SkipWs(js, j);
      if (key == "name") a.name = ParseString(js, j);
      else if (key == "dtype") a.dtype = ParseString(js, j);
      else if (key == "shape") a.shape = ParseIntArray(js, j);
      else if (key == "offset") a.offset = ParseInt(js, j);
      else if (key == "nbytes") a.nbytes = ParseInt(js, j);
      SkipWs(js, j);
    }
    m.args.push_back(a);
    i = j + 1;
  }
  size_t k = js.find("\"image_input\"");
  k = js.find("\"shape\"", k);
  k = js.find(':', k) + 1;
  m.image_shape = ParseIntArray(js, k);
  m.nms = js.find("\"nms\": true") != std::string::npos;
  return m;
}

xla::PrimitiveType DtypeToXla(const std::string& d) {
  if (d == "float32") return xla::F32;
  if (d == "bfloat16") return xla::BF16;
  if (d == "uint8") return xla::U8;
  if (d == "int32") return xla::S32;
  if (d == "bool") return xla::PRED;
  fprintf(stderr, "unsupported dtype %s\n", d.c_str());
  exit(2);
}

}  // namespace

extern "C" void SegvHandler(int sig) {
  const char msg[] = "\n== fatal signal, backtrace: ==\n";
  ssize_t unused = write(2, msg, sizeof(msg) - 1);
  (void)unused;
  void* frames[64];
  int n = backtrace(frames, 64);
  backtrace_symbols_fd(frames, n, 2);
  _exit(139);
}

void InstallHandlers() {
  static char altstack[1 << 20];
  stack_t ss{altstack, 0, sizeof(altstack)};
  sigaltstack(&ss, nullptr);
  struct sigaction sa {};
  sa.sa_handler = SegvHandler;
  sa.sa_flags = SA_ONSTACK;
  for (int sig : {SIGSEGV, SIGABRT, SIGILL, SIGBUS, SIGFPE}) sigaction(sig, &sa, nullptr);
}

int main(int argc, char** argv) {
  InstallHandlers();
  if (argc < 3) {
    fprintf(stderr, "usage: %s <export_stem> <image.bin> [conf]\n", argv[0]);
    return 1;
  }
  const std::string stem = argv[1];
  const std::string image_path = argv[2];
  const float conf = argc > 3 ? atof(argv[3]) : 0.25f;

  const std::string mlir_text = ReadFile(stem + ".stablehlo");
  const std::string weights = ReadFile(stem + ".weights.bin");
  const Manifest manifest = ParseManifest(ReadFile(stem + ".weights.json"));
  const std::string image = ReadFile(image_path);

  // sanity: manifest must tile the weights blob exactly
  int64_t total = 0;
  for (const Arg& a : manifest.args) {
    int64_t elems = 1;
    for (int64_t d : a.shape) elems *= d;
    const int64_t esz = a.dtype == "float32" || a.dtype == "int32" ? 4 : a.dtype == "bfloat16" ? 2 : 1;
    if (a.nbytes != elems * esz || a.offset != total) {
      fprintf(stderr, "manifest inconsistency at %s: offset=%ld nbytes=%ld elems=%ld\n",
              a.name.c_str(), (long)a.offset, (long)a.nbytes, (long)elems);
      return 2;
    }
    total += a.nbytes;
  }
  if (total != (int64_t)weights.size()) {
    fprintf(stderr, "weights.bin %zu bytes, manifest sums to %ld\n", weights.size(), (long)total);
    return 2;
  }

  int64_t img_elems = 1;
  for (int64_t d : manifest.image_shape) img_elems *= d;
  if ((int64_t)image.size() != img_elems) {
    fprintf(stderr, "image.bin has %zu bytes, manifest expects %ld\n", image.size(), (long)img_elems);
    return 2;
  }

  // 1+2: MLIR text -> XlaComputation
  xla::XlaComputation computation;
  auto st = xla::ParseMlirModuleStringAndConvertToXlaComputation(
      mlir_text, computation, /*use_tuple_args=*/false, /*return_tuple=*/false);
  if (!st.ok()) {
    fprintf(stderr, "MLIR->HLO failed: %s\n", std::string(st.message()).c_str());
    return 2;
  }

  // 3: PjRt CPU client + compile
  xla::CpuClientOptions opts;
  opts.cpu_device_count = 1;
  opts.asynchronous = false;  // run computations inline (simple deterministic path)
  auto client_or = xla::GetXlaPjrtCpuClient(std::move(opts));
  if (!client_or.ok()) {
    fprintf(stderr, "client: %s\n", std::string(client_or.status().message()).c_str());
    return 2;
  }
  std::unique_ptr<xla::PjRtClient> client = std::move(client_or.value());
  xla::CompileOptions copts;
  auto exe_or = client->CompileAndLoad(computation, copts);
  if (!exe_or.ok()) {
    fprintf(stderr, "compile: %s\n", std::string(exe_or.status().message()).c_str());
    return 2;
  }
  auto executable = std::move(exe_or.value());
  fprintf(stderr, "compiled %s.stablehlo (%zu weight args)\n", stem.c_str(), manifest.args.size());

  // 4: device buffers for every weight leaf + the image
  xla::PjRtDevice* device = client->addressable_devices()[0];
  auto mem_or = device->default_memory_space();
  if (!mem_or.ok()) {
    fprintf(stderr, "memspace: %s\n", std::string(mem_or.status().message()).c_str());
    return 2;
  }
  xla::PjRtMemorySpace* mem = mem_or.value();

  std::vector<std::unique_ptr<xla::PjRtBuffer>> owned;
  auto upload = [&](const void* data, xla::PrimitiveType t, const std::vector<int64_t>& dims) {
    auto buf_or = client->BufferFromHostBuffer(
        data, t, dims, /*byte_strides=*/std::nullopt,
        xla::PjRtClient::HostBufferSemantics::kImmutableUntilTransferCompletes,
        /*on_done_with_host_buffer=*/nullptr, mem, /*device_layout=*/nullptr);
    if (!buf_or.ok()) {
      fprintf(stderr, "upload: %s\n", std::string(buf_or.status().message()).c_str());
      exit(2);
    }
    owned.push_back(std::move(buf_or.value()));
  };
  for (const Arg& a : manifest.args) {
    upload(weights.data() + a.offset, DtypeToXla(a.dtype), a.shape);
  }
  upload(image.data(), xla::U8, manifest.image_shape);
  fprintf(stderr, "uploaded %zu buffers\n", owned.size());

  std::vector<xla::PjRtBuffer*> arg_ptrs;
  arg_ptrs.reserve(owned.size());
  for (auto& b : owned) arg_ptrs.push_back(b.get());

  // 5: execute + dump outputs
  InstallHandlers();  // re-install: client init may replace crash handlers
  fprintf(stderr, "exe name=%s replicas=%d addressable=%zu\n",
          std::string(executable->name()).c_str(), executable->num_replicas(),
          executable->addressable_devices().size());
  fprintf(stderr, "executing...\n");
  xla::ExecuteOptions eopts;
  auto out_or = executable->Execute({arg_ptrs}, eopts);
  if (!out_or.ok()) {
    fprintf(stderr, "execute: %s\n", std::string(out_or.status().message()).c_str());
    return 2;
  }
  auto& outs = out_or.value()[0];
  for (size_t i = 0; i < outs.size(); ++i) {
    auto lit_or = outs[i]->ToLiteralSync();
    if (!lit_or.ok()) {
      fprintf(stderr, "fetch %zu: %s\n", i, std::string(lit_or.status().message()).c_str());
      return 2;
    }
    std::shared_ptr<xla::Literal> lit = lit_or.value();
    const std::string out_path = "out_" + std::to_string(i) + ".bin";
    std::ofstream of(out_path, std::ios::binary);
    of.write(reinterpret_cast<const char*>(lit->untyped_data()), lit->size_bytes());
    printf("output[%zu]: %s -> %s (%zu bytes)\n", i,
           xla::ShapeUtil::HumanString(lit->shape()).c_str(), out_path.c_str(), lit->size_bytes());
  }

  // Detection pretty-print for the embedded-NMS layout: out0 = (B, max_det, 6)
  // f32 [x1,y1,x2,y2,conf,cls], out1 = (B,) i32 n_valid.
  if (manifest.nms && outs.size() >= 2) {
    auto det = outs[0]->ToLiteralSync().value();
    auto nv = outs[1]->ToLiteralSync().value();
    const float* d = static_cast<const float*>(det->untyped_data());
    const int32_t* n = static_cast<const int32_t*>(nv->untyped_data());
    const auto& shape = det->shape();
    int64_t max_det = shape.dimensions(1);
    for (int64_t b = 0; b < shape.dimensions(0); ++b) {
      for (int64_t k = 0; k < n[b] && k < max_det; ++k) {
        const float* row = d + (b * max_det + k) * 6;
        if (row[4] < conf) continue;
        printf("det b=%ld cls=%d conf=%.3f box=[%.1f, %.1f, %.1f, %.1f]\n",
               (long)b, (int)row[5], row[4], row[0], row[1], row[2], row[3]);
      }
    }
  }
  return 0;
}
