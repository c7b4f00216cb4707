# Pure-Ruby binding for jellyfish_tpu databases — the role of the
# reference's SWIG Ruby binding (swig/mer_file.i, swig/mer_dna.i,
# swig/string_mers.i, swig/ruby/) without needing SWIG or a C toolchain:
# the binary DB format is reference-compatible, so reading/querying it
# needs only core Ruby (json stdlib).
#
# Surface (mirrors swig/jellyfish.i class names):
#   JellyfishTPU::MerDNA          — k-mer string value type
#   JellyfishTPU::ReadMerFile     — stream (mer, count) records of a DB
#   JellyfishTPU::QueryMerFile    — random access count lookups (2k <= 64)
#   JellyfishTPU.string_mers / string_canonicals — mer enumerators
#
# require_relative '<repo>/ruby/jellyfish_tpu'

require 'json'

module JellyfishTPU
  VERSION = '0.1'.freeze

  BASES = %w[A C G T].freeze
  CODE  = { 'A' => 0, 'C' => 1, 'G' => 2, 'T' => 3 }.freeze
  COMP  = { 'A' => 'T', 'C' => 'G', 'G' => 'C', 'T' => 'A' }.freeze

  # k-mer string value type (mer_dna.hpp string-domain role)
  class MerDNA
    attr_reader :s

    def initialize(s = '')
      @s = s.to_s.upcase
    end

    def to_s = @s
    def ==(other) = to_s == other.to_s
    def length = @s.length
    def k = @s.length

    def get_reverse_complement
      MerDNA.new(@s.reverse.chars.map { |c| COMP[c] || 'N' }.join)
    end

    def reverse_complement!
      @s = get_reverse_complement.s
      self
    end

    # canonical = min(mer, revcomp) (mer_dna.hpp:416-431 rule)
    def get_canonical
      rc = get_reverse_complement
      @s <= rc.s ? MerDNA.new(@s) : rc
    end

    def canonicalize!
      @s = get_canonical.s
      self
    end

    # re-roll to a uniform random mer in place (SWIG MerDNA#randomize!,
    # used by the reference's hash tests); k overrides current length
    def randomize!(k = nil)
      k ||= (@s.empty? ? 16 : @s.length)
      @s = Array.new(k) { 'ACGT'[rand(4)] }.join
      self
    end

    # sliding-window shifts (mer_dna.hpp:322-370 role, string-domain)
    def shift_left(base)
      @s = @s[1..] + base.upcase
      self
    end

    def shift_right(base)
      @s = base.upcase + @s[0..-2]
      self
    end

    # 2-bit code (A0 C1 G2 T3, mer_dna.hpp:38-55) of base at index i
    def code(i) = CODE[@s[i]]

    # numeric value, 2 bits/base, leftmost base most significant
    def bits
      @s.chars.reduce(0) do |v, ch|
        c = CODE[ch] or raise ArgumentError, "invalid base #{ch.inspect}"
        (v << 2) | c
      end
    end

    def self.from_bits(bits, k)
      out = Array.new(k)
      (k - 1).downto(0) do |i|
        out[i] = BASES[bits & 3]
        bits >>= 2
      end
      new(out.join)
    end
  end

  # JSON file header: 9-digit decimal length + JSON + NUL pad
  # (generic_file_header.hpp:88-143 format)
  class Header
    attr_reader :root, :offset

    def self.read(io)
      digits = io.read(9)
      raise 'truncated header length' unless digits&.length == 9
      raise 'bad header length field' unless digits =~ /\A\d{9}\z/

      hlen = digits.to_i
      json = io.read(hlen)
      raise 'truncated header' unless json&.length == hlen

      new(JSON.parse(json.sub(/\0+\z/, '')), 9 + hlen)
    end

    def initialize(root, offset)
      @root = root
      @offset = offset
    end

    def key_len = @root['key_len'].to_i
    def counter_len = (@root['counter_len'] || 4).to_i
    def size = @root['size'].to_i
    def format = @root['format']
    def canonical = @root['canonical'] ? true : false

    # GF(2) matrix columns for position ordering, or nil for identity
    # (rectangular_binary_matrix.hpp:156 convention: key bit 0 pairs with
    # the LAST column)
    def matrix_columns
      m = @root['matrix1']
      return nil if m.nil? || m['identity']

      m['columns'].map(&:to_i)
    end
  end

  # stream (mer, count) records of a binary/sorted DB in file (hash) order
  # (swig/mer_file.i ReadMerFile semantics)
  class ReadMerFile
    attr_reader :header, :mer, :count

    def initialize(path)
      @io = File.open(path, 'rb')
      @header = Header.read(@io)
      unless @header.format == 'binary/sorted'
        raise 'ReadMerFile requires a binary/sorted database'
      end
      @k = @header.key_len / 2
      @key_bytes = (@header.key_len + 7) / 8
      @clen = @header.counter_len
      @mer = nil
      @count = nil
    end

    # advance; true and sets mer/count, or false at EOF
    def next_mer
      rec = @key_bytes + @clen
      buf = @io.read(rec)
      return false if buf.nil? || buf.empty?
      raise 'truncated record' unless buf.length == rec

      bytes = buf.byteslice(0, @key_bytes).bytes
      # little-endian 2-bit packed; base j (rightmost = j=k-1) is bit pair j
      chars = Array.new(@k)
      @k.times do |j|
        bit = 2 * j
        c = (bytes[bit >> 3] >> (bit & 7)) & 3
        chars[@k - 1 - j] = BASES[c]
      end
      @mer = MerDNA.new(chars.join)
      @count = buf.byteslice(@key_bytes, @clen).bytes
                  .each_with_index.reduce(0) { |v, (b, i)| v | (b << (8 * i)) }
      true
    end

    def each
      yield @mer, @count while next_mer
    end

    def close = @io.close
  end

  # random-access lookups via binary search on (hash position, key) order
  # (binary_dumper.hpp:148-189 role). Pure-Ruby restriction: 2k <= 64.
  class QueryMerFile
    attr_reader :header

    def initialize(path)
      @io = File.open(path, 'rb')
      @header = Header.read(@io)
      unless @header.format == 'binary/sorted'
        raise 'QueryMerFile requires a binary/sorted database'
      end
      raise 'pure-Ruby query supports k <= 32' if @header.key_len > 64

      @k = @header.key_len / 2
      @key_bytes = (@header.key_len + 7) / 8
      @clen = @header.counter_len
      @mask = @header.size - 1
      @cols = @header.matrix_columns
      @canonical = @header.canonical
      @rec = @key_bytes + @clen
      data = @io.size - @header.offset
      raise 'db size not a multiple of record length' unless (data % @rec).zero?

      @n = data / @rec
    end

    # count of a mer (String or MerDNA); canonicalizes if the DB is
    def get(mer)
      m = mer.is_a?(MerDNA) ? mer : MerDNA.new(mer)
      raise 'query mer length != database k' unless m.length == @k

      m = m.get_canonical if @canonical
      key = m.bits
      pos = hash_pos(key)
      lo = 0
      hi = @n
      while lo < hi
        mid = (lo + hi) / 2
        mk = key_at(mid)
        mp = hash_pos(mk)
        if mp < pos || (mp == pos && mk < key)
          lo = mid + 1
        else
          hi = mid
        end
      end
      return 0 if lo >= @n

      key_at(lo) == key ? val_at(lo) : 0
    end
    alias [] get

    def close = @io.close

    private

    def hash_pos(key)
      return key & @mask if @cols.nil?

      res = 0
      k = key
      (@cols.length - 1).downto(0) do |j|
        res ^= @cols[j] if (k & 1) == 1
        k >>= 1
      end
      res & @mask
    end

    def key_at(i)
      @io.seek(@header.offset + i * @rec)
      @io.read(@key_bytes).bytes
         .each_with_index.reduce(0) { |v, (b, j)| v | (b << (8 * j)) }
    end

    def val_at(i)
      @io.seek(@header.offset + i * @rec + @key_bytes)
      @io.read(@clen).bytes
         .each_with_index.reduce(0) { |v, (b, j)| v | (b << (8 * j)) }
    end
  end

  module_function

  # enumerate all k-mers of a sequence; invalid bases break windows
  # (swig/string_mers.i role)
  def string_mers(seq, k, canonical: false)
    s = seq.to_s.upcase
    Enumerator.new do |y|
      (0..s.length - k).each do |i|
        w = s[i, k]
        next if w =~ /[^ACGT]/

        m = MerDNA.new(w)
        y << (canonical ? m.get_canonical : m)
      end
    end
  end

  def string_canonicals(seq, k)
    string_mers(seq, k, canonical: true)
  end

  # Counting hash on mer keys — the reference's SWIG HashCounter proxy
  # (swig/hash_counter.i:13-58) for scripting-scale counting. Semantics
  # match swig/ruby/test_hash_counter.rb: add always accumulates and
  # returns true iff the mer was new; update_add adds only to existing
  # mers; get/[] return the count or nil; size is the power-of-2 table
  # size and doubles as the hash fills.
  class HashCounter
    attr_reader :val_len

    def initialize(size, val_len = 4, _nb_threads = 1)
      @size = 1
      @size <<= 1 while @size < size
      @val_len = val_len
      @h = {}
    end

    def size = @size

    def add(mer, val)
      k = mer.to_s
      was_new = !@h.key?(k)
      @h[k] = (@h[k] || 0) + val
      grow
      was_new
    end

    def update_add(mer, val)
      k = mer.to_s
      return false unless @h.key?(k)

      @h[k] += val
      true
    end

    def get(mer) = @h[mer.to_s]
    def [](mer) = @h[mer.to_s]

    private

    def grow
      @size <<= 1 while @h.size > @size * 0.7
    end
  end

  # Mer set — the reference's SWIG HashSet proxy (swig/hash_set.i:13-43)
  class HashSet
    def initialize(size, _nb_threads = 1)
      @size = 1
      @size <<= 1 while @size < size
      @h = {}
    end

    def size = @size

    def add(mer)
      k = mer.to_s
      was_new = !@h.key?(k)
      @h[k] = true
      @size <<= 1 while @h.size > @size * 0.7
      was_new
    end

    def get(mer) = @h.key?(mer.to_s)
    def [](mer) = get(mer)
  end
end
