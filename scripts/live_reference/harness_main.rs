//! Line-protocol harness over the REFERENCE qfilter crate's public
//! fingerprint-level API, for live differential testing against
//! qfilter_spark.rsqf.Filter (tests/test_live_reference.py).
//!
//! Protocol: one command per line on stdin, one response line on stdout
//! (pipelined — the driver writes a batch, then reads a batch). Filters
//! live in a table addressed by the id returned from the constructors.
//!
//!   new <cap> <fp_rate>                 -> id <n> | err <E>
//!   new_resizeable <icap> <mcap> <fp>   -> id <n> | err <E>
//!   with_fp_size <cap> <bits>           -> id <n> | err <E>
//!   insert <id> <dup:0|1> <hash>        -> ok <0|1> | err <E>
//!   insert_counting <id> <max> <hash>   -> ok <prev_count> | err <E>
//!   contains <id> <hash>                -> ok <0|1>
//!   count <id> <hash>                   -> ok <n>
//!   remove <id> <hash>                  -> ok <0|1>
//!   len <id> / capacity <id> / capacity_resizeable <id> / fp_size <id>
//!   mem <id>                            -> ok <n>
//!   max_err <id> / max_err_resizeable <id> / cur_err <id> -> ok <float>
//!   fingerprints <id>                   -> ok <fp> <fp> ...
//!   merge <id> <keep:0|1> <other_id>    -> ok | err <E>
//!   shrink <id> / clear <id>            -> ok
//!   bench <cap> <fp_rate> <n> <seed>    -> ok <insert_secs> <query_secs> <miss_query_secs> <n_found>
//!       (throughput baseline: insert n xorshift64*-random hashes with
//!        duplicate=true, query all n present + n absent, all timed
//!        in-process so protocol overhead is excluded)
//!   quit

use std::io::{BufRead, Write};

use qfilter::Filter;

fn main() {
    let stdin = std::io::stdin();
    let stdout = std::io::stdout();
    let mut out = std::io::BufWriter::new(stdout.lock());
    let mut filters: Vec<Filter> = Vec::new();

    for line in stdin.lock().lines() {
        let line = line.unwrap();
        let t: Vec<&str> = line.split_whitespace().collect();
        if t.is_empty() {
            continue;
        }
        let resp = match t[0] {
            "quit" => break,
            "new" => match Filter::new(t[1].parse().unwrap(), t[2].parse().unwrap()) {
                Ok(f) => {
                    filters.push(f);
                    format!("id {}", filters.len() - 1)
                }
                Err(e) => format!("err {:?}", e),
            },
            "new_resizeable" => match Filter::new_resizeable(
                t[1].parse().unwrap(),
                t[2].parse().unwrap(),
                t[3].parse().unwrap(),
            ) {
                Ok(f) => {
                    filters.push(f);
                    format!("id {}", filters.len() - 1)
                }
                Err(e) => format!("err {:?}", e),
            },
            "with_fp_size" => {
                match Filter::with_fingerprint_size(t[1].parse().unwrap(), t[2].parse().unwrap()) {
                    Ok(f) => {
                        filters.push(f);
                        format!("id {}", filters.len() - 1)
                    }
                    Err(e) => format!("err {:?}", e),
                }
            }
            "insert" => {
                let f = &mut filters[t[1].parse::<usize>().unwrap()];
                match f.insert_fingerprint(t[2] == "1", t[3].parse().unwrap()) {
                    Ok(b) => format!("ok {}", b as u8),
                    Err(e) => format!("err {:?}", e),
                }
            }
            "insert_counting" => {
                let f = &mut filters[t[1].parse::<usize>().unwrap()];
                match f.insert_fingerprint_counting(t[2].parse().unwrap(), t[3].parse().unwrap()) {
                    Ok(c) => format!("ok {}", c),
                    Err(e) => format!("err {:?}", e),
                }
            }
            "contains" => {
                let f = &filters[t[1].parse::<usize>().unwrap()];
                format!("ok {}", f.contains_fingerprint(t[2].parse().unwrap()) as u8)
            }
            "count" => {
                let f = &mut filters[t[1].parse::<usize>().unwrap()];
                format!("ok {}", f.count_fingerprint(t[2].parse().unwrap()))
            }
            "remove" => {
                let f = &mut filters[t[1].parse::<usize>().unwrap()];
                format!("ok {}", f.remove_fingerprint(t[2].parse().unwrap()) as u8)
            }
            "len" => format!("ok {}", filters[t[1].parse::<usize>().unwrap()].len()),
            "capacity" => format!("ok {}", filters[t[1].parse::<usize>().unwrap()].capacity()),
            "capacity_resizeable" => format!(
                "ok {}",
                filters[t[1].parse::<usize>().unwrap()].capacity_resizeable()
            ),
            "fp_size" => format!(
                "ok {}",
                filters[t[1].parse::<usize>().unwrap()].fingerprint_size()
            ),
            "mem" => format!(
                "ok {}",
                filters[t[1].parse::<usize>().unwrap()].memory_usage()
            ),
            "max_err" => format!(
                "ok {}",
                filters[t[1].parse::<usize>().unwrap()].max_error_ratio()
            ),
            "max_err_resizeable" => format!(
                "ok {}",
                filters[t[1].parse::<usize>().unwrap()].max_error_ratio_resizeable()
            ),
            "cur_err" => format!(
                "ok {}",
                filters[t[1].parse::<usize>().unwrap()].current_error_ratio()
            ),
            "fingerprints" => {
                let f = &filters[t[1].parse::<usize>().unwrap()];
                let fps: Vec<String> = f.fingerprints().map(|x| x.to_string()).collect();
                format!("ok {}", fps.join(" "))
            }
            "merge" => {
                let oi = t[3].parse::<usize>().unwrap();
                let other = filters[oi].clone();
                let f = &mut filters[t[1].parse::<usize>().unwrap()];
                match f.merge(t[2] == "1", &other) {
                    Ok(()) => "ok".to_string(),
                    Err(e) => format!("err {:?}", e),
                }
            }
            "shrink" => {
                filters[t[1].parse::<usize>().unwrap()].shrink_to_fit();
                "ok".to_string()
            }
            "clear" => {
                filters[t[1].parse::<usize>().unwrap()].clear();
                "ok".to_string()
            }
            "bench" => {
                let cap: u64 = t[1].parse().unwrap();
                let fp_rate: f64 = t[2].parse().unwrap();
                let n: usize = t[3].parse().unwrap();
                let seed: u64 = t[4].parse().unwrap();
                let mut f = Filter::new(cap, fp_rate).unwrap();
                let mut s = seed.max(1);
                let mut next = move || {
                    // xxhash-free xorshift64* PRNG (no deps)
                    s ^= s >> 12;
                    s ^= s << 25;
                    s ^= s >> 27;
                    s.wrapping_mul(0x2545F4914F6CDD1D)
                };
                let present: Vec<u64> = (0..n).map(|_| next()).collect();
                let absent: Vec<u64> = (0..n).map(|_| next()).collect();
                let t0 = std::time::Instant::now();
                for &h in &present {
                    f.insert_fingerprint(true, h).unwrap();
                }
                let insert_secs = t0.elapsed().as_secs_f64();
                let t1 = std::time::Instant::now();
                let mut found = 0u64;
                for &h in &present {
                    found += f.contains_fingerprint(h) as u64;
                }
                let query_secs = t1.elapsed().as_secs_f64();
                let t2 = std::time::Instant::now();
                for &h in &absent {
                    found += f.contains_fingerprint(h) as u64;
                }
                let miss_secs = t2.elapsed().as_secs_f64();
                format!(
                    "ok {} {} {} {}",
                    insert_secs, query_secs, miss_secs, found
                )
            }
            other => format!("err unknown_command {}", other),
        };
        writeln!(out, "{}", resp).unwrap();
        out.flush().unwrap();
    }
}
