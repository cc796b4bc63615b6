//! Compile-time stand-in for the `xxhash-rust` crate (offline sandbox has
//! no crates.io access), exposing exactly the surface the reference's
//! stable_hasher.rs uses: `xxhash_rust::xxh3::Xxh3Default` implementing
//! `core::hash::Hasher`.
//!
//! THIS IS NOT XXH3. The live-reference differential tests drive the
//! reference EXCLUSIVELY through its fingerprint-level public API
//! (`insert_fingerprint*`, `contains_fingerprint`, `count_fingerprint`,
//! `remove_fingerprint`, `merge`, `fingerprints`), which never touches the
//! item hasher — so the stub's hash function is never exercised on any
//! asserted path. It still has to be a deterministic Hasher for the crate
//! to compile; FNV-1a is used purely as a placeholder. Item-level hashing
//! parity is intentionally out of scope: the Spark engine hashes with
//! Spark-compatible XXH64 by design (qfilter_spark/hashing.py), not xxh3.

pub mod xxh3 {
    pub struct Xxh3Default {
        state: u64,
    }

    impl Xxh3Default {
        pub fn new() -> Self {
            Self {
                state: 0xcbf29ce484222325,
            }
        }
    }

    impl Default for Xxh3Default {
        fn default() -> Self {
            Self::new()
        }
    }

    impl core::hash::Hasher for Xxh3Default {
        fn finish(&self) -> u64 {
            self.state
        }

        fn write(&mut self, bytes: &[u8]) {
            for &b in bytes {
                self.state ^= b as u64;
                self.state = self.state.wrapping_mul(0x100000001b3);
            }
        }
    }
}
