// Minimal stand-in for mlir/IR/BuiltinOps.h (the tensorflow wheel exports the
// XLA PjRt symbols but ships no MLIR headers). xla/pjrt/pjrt_client.h only
// *declares* Compile/CompileAndLoad overloads taking mlir::ModuleOp by value
// with trivial Unimplemented bodies; this app never calls them, so any
// complete type with matching mangled name compiles those declarations.
#pragma once
namespace mlir {
class MLIRContext;
class ModuleOp {
 public:
  void* opaque_ = nullptr;
};
}  // namespace mlir
