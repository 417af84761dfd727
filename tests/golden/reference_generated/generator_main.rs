// Golden-byte generator: runs the REFERENCE implementation
// (path-dependency on /root/reference/datasketches, unmodified) to emit
// .sk files for the bloom / countmin / frequencies wire formats. The
// repo's pytest suite decodes these with the from-scratch Python
// decoders — fixtures produced by the reference itself, not by our
// encoder.
use std::fs;
use std::path::Path;

use datasketches::bloom::BloomFilterBuilder;
use datasketches::countmin::CountMinSketch;
use datasketches::frequencies::FrequentItemsSketch;

fn dump(dir: &Path, name: &str, bytes: Vec<u8>) {
    let p = dir.join(name);
    fs::write(&p, &bytes).unwrap();
    println!("{}  {} bytes", p.display(), bytes.len());
}

fn main() {
    let dir = Path::new("/tmp/dsrs_reference_goldens");
    fs::create_dir_all(dir).unwrap();

    // ---- bloom ----
    // empty, explicit size (512 bits, 3 hashes, default seed)
    let bf = BloomFilterBuilder::with_size(512, 3).build();
    dump(dir, "bloom_empty_m512_h3.sk", bf.serialize());

    // u64 keys 0..100 (the reference serialization test's own insert
    // pattern: integers hashed as u64)
    let mut bf = BloomFilterBuilder::with_size(512, 3).build();
    for i in 0u64..100 {
        bf.insert(i);
    }
    println!("bloom m512 h3 n100 bits_used={}", bf.bits_used());
    dump(dir, "bloom_u64_m512_h3_n100.sk", bf.serialize());

    // accuracy-built (n=1000, fpp=0.01), u64 keys 0..100
    let mut bf = BloomFilterBuilder::with_accuracy(1000, 0.01).build();
    for i in 0u64..100 {
        bf.insert(i);
    }
    println!(
        "bloom acc n1000 fpp0.01: capacity={} k={} bits_used={}",
        bf.capacity(),
        bf.num_hashes(),
        bf.bits_used()
    );
    dump(dir, "bloom_acc_n1000_fpp1e2_n100.sk", bf.serialize());

    // non-default seed
    let mut bf = BloomFilterBuilder::with_size(256, 5).seed(1234).build();
    for i in 0u64..20 {
        bf.insert(i);
    }
    dump(dir, "bloom_seed1234_m256_h5_n20.sk", bf.serialize());

    // ---- countmin ----
    let cm = CountMinSketch::<i64>::new(4, 128);
    dump(dir, "countmin_empty_h4_b128.sk", cm.serialize());

    let mut cm = CountMinSketch::<i64>::new(4, 256);
    for i in 0u64..50 {
        cm.update_with_weight(i, (i as i64) + 1);
    }
    println!(
        "countmin h4 b256: total_weight={} est(0)={} est(49)={}",
        cm.total_weight(),
        cm.estimate(0u64),
        cm.estimate(49u64)
    );
    dump(dir, "countmin_i64_h4_b256_n50.sk", cm.serialize());

    // ---- frequencies ----
    let fs_empty = FrequentItemsSketch::<i64>::new(64);
    dump(dir, "freq_empty_lg6.sk", fs_empty.serialize());

    // i64 items with deterministic zipf-ish counts, no purge (8 items
    // in a 64-map: exact counts, NoFP == NoFN)
    let mut f = FrequentItemsSketch::<i64>::new(64);
    for k in 0i64..8 {
        f.update_with_count(k * 11, (100 / (k as u64 + 1)).max(1));
    }
    println!(
        "freq i64: active={} total={} est(0)={}",
        f.num_active_items(),
        f.total_weight(),
        f.estimate(&0i64)
    );
    dump(dir, "freq_i64_lg6_n8.sk", f.serialize());

    // String items
    let mut f = FrequentItemsSketch::<String>::new(64);
    for k in 0..6 {
        f.update_with_count(format!("item{:03}", k), 50 - 7 * k as u64);
    }
    println!(
        "freq str: active={} total={}",
        f.num_active_items(),
        f.total_weight()
    );
    dump(dir, "freq_str_lg6_n6.sk", f.serialize());

    // purge exercised: 80 distinct items into a max-map-size-64 sketch
    // (cur map 64 -> purge at 0.75*64=48 active): offsets nonzero
    let mut f = FrequentItemsSketch::<i64>::new(64);
    for k in 0i64..80 {
        f.update_with_count(k, (k as u64 % 13) + 1);
    }
    println!(
        "freq purged: active={} total={} max_err={}",
        f.num_active_items(),
        f.total_weight(),
        f.maximum_error()
    );
    dump(dir, "freq_i64_lg6_purged_n80.sk", f.serialize());
}
