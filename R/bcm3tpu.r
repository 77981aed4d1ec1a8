# R interface to the bcm3_tpu framework via reticulate.
#
# Drop-in replacement for the reference's C++ bridge loader (R/evaluate.r +
# bcmrbridge.so): the function names and signatures below match the
# reference exactly, so analysis scripts written against
# R/evaluate_popPK.r / evaluate_PK.r keep working — source this file
# instead of evaluate.r and everything else is unchanged.
#
# Backend: bcm3_tpu.rbridge (Python), whose accessor contract is tested in
# the framework's CI (tests/test_rbridge.py). This veneer adds no logic:
# each function is one reticulate call. Requires the `reticulate` package
# and a Python environment with bcm3_tpu importable (set
# RETICULATE_PYTHON or use reticulate::use_python / use_virtualenv).

library(reticulate)

.bcm3tpu <- NULL

.bcm3tpu.module <- function() {
  if (is.null(.bcm3tpu)) {
    .bcm3tpu <<- reticulate::import("bcm3_tpu.rbridge", delay_load = FALSE)
  }
  .bcm3tpu
}

# --- lifecycle (reference: R/evaluate.r bcm3.init.cpp / release) ----------

bcm3.init.cpp <- function(bcm3, clparam = "", threads = NA) {
  mod <- .bcm3tpu.module()
  bcm3$.cpp <- mod$init(bcm3$base_folder,
                        basename(bcm3$prior$file_name),
                        basename(bcm3$likelihood$file_name))
  return(bcm3)
}

bcm3.reinit.cpp <- function(bcm3, clparam = "", threads = NA) {
  mod <- .bcm3tpu.module()
  mod$cleanup(bcm3$.cpp)
  bcm3$.cpp <- mod$init(bcm3$base_folder,
                        basename(bcm3$prior$file_name),
                        basename(bcm3$likelihood$file_name))
  return(bcm3)
}

bcm3.release.cpp <- function(bcm3) {
  mod <- .bcm3tpu.module()
  mod$cleanup(bcm3$.cpp)
  bcm3$.cpp <- NULL
  return(bcm3)
}

# --- PopPK accessors (reference: R/evaluate_popPK.r) -----------------------

bcm3.popPK.get.likelihood <- function(bcm3, param.values) {
  mod <- .bcm3tpu.module()
  return(mod$get_log_likelihood(bcm3$.cpp, as.numeric(param.values)))
}

bcm3.popPK.get.observed.data <- function(bcm3) {
  mod <- .bcm3tpu.module()
  res <- mod$popPK_get_observed_data(bcm3$.cpp)
  retval <- list()
  retval$time <- as.numeric(res$time)
  retval$data <- res$data  # (timepoints, patients), as in the reference
  return(retval)
}

bcm3.popPK.get.simulated.data <- function(bcm3, param.values) {
  mod <- .bcm3tpu.module()
  res <- mod$popPK_get_simulated_data(bcm3$.cpp, as.numeric(param.values))
  retval <- list()
  retval$time <- as.numeric(res$time)
  retval$data <- res$data
  return(retval)
}

# --- single-patient PK ------------------------------------------------------

bcm3.PK.get.likelihood <- function(bcm3, param.values) {
  mod <- .bcm3tpu.module()
  return(mod$get_log_likelihood(bcm3$.cpp, as.numeric(param.values)))
}

bcm3.PK.get.simulated.trajectories <- function(bcm3, param.values) {
  mod <- .bcm3tpu.module()
  res <- mod$PK_get_simulated_trajectories(bcm3$.cpp, as.numeric(param.values))
  retval <- list()
  retval$time <- as.numeric(res$time)
  retval$data <- res$data
  return(retval)
}
