-- Generative mix: both the GRAPH and the SCORE are composed by Lua code.
-- Not a reference port — this demonstrates the first-party Lua 5.3
-- surface (coroutines, goto, operator metamethods, table.sort) plus the
-- declare_floww extension (patterns declared in-script, no MIDI files)
-- on the shared example drum samples.

set_length(16.0);
set_render_samplerate(48000);
set_render_bitdepth(16);
set_output_file("outp.wav");

load_sample("kick", "../assets/kick.wav", "");
load_sample("hat", "../assets/hihat_closed.wav", "");
load_sample("ride", "../assets/ride.wav", "");
load_lv2("compressor", "http://calf.sourceforge.net/plugins/Compressor");
load_lv2("reverb", "http://calf.sourceforge.net/plugins/Reverb");

-- ---- score generation (8 bars at 120 bpm, 2 s per bar) -----------------

local function euclid(pulses, steps)  -- Bjorklund-style onset spread
  local pat, bucket = {}, 0
  for i = 1, steps do
    bucket = bucket + pulses
    if bucket >= steps then
      bucket = bucket - steps
      pat[i] = true
    else
      pat[i] = false
    end
  end
  return pat
end

local function pattern_events(pat, step_s, note, vel, dur)
  local ev = {}
  for bar = 0, 7 do
    for i, on in ipairs(pat) do
      if on then
        local t = bar * 2.0 + (i - 1) * step_s
        table.insert(ev, { t, note, vel })
        table.insert(ev, { t + dur, note, 0.0 })
      end
    end
  end
  return ev
end

declare_floww("kickf", pattern_events(euclid(3, 8), 0.25, 36, 0.9, 0.1));
declare_floww("hatf", pattern_events(euclid(7, 16), 0.125, 42, 0.55, 0.05));
declare_floww("ridef", pattern_events(euclid(2, 8), 0.25, 51, 0.5, 0.3));

-- bass line: a coroutine walks up and down a minor-pentatonic scale
local scale = { 33, 36, 40, 43, 45 }
local walk = coroutine.wrap(function()
  local i, dir = 1, 1
  while true do
    coroutine.yield(scale[i])
    i = i + dir
    if i >= #scale then dir = -1 elseif i <= 1 then dir = 1 end
  end
end)
local bass = {}
for step = 0, 31 do
  local n = walk()
  table.insert(bass, { step * 0.5, n, 0.8 })
  table.insert(bass, { step * 0.5 + 0.4, n, 0.0 })
end
declare_floww("bassf", bass);

-- ---- graph generation ---------------------------------------------------

-- stereo dealer: a coroutine that fans voices across the field, each
-- resume dealing the next (angle, gain) pair outward-and-quieter
local dealer = coroutine.wrap(function()
  local n = 0
  ::deal::
  local side = (n % 2 == 0) and 1.0 or -1.0
  local ring = math.floor(n / 2)
  coroutine.yield(side * (8.0 + 14.0 * ring), 0.8 - 0.15 * ring)
  n = n + 1
  goto deal
end)

-- gain-budget "vector" accumulated through an __add metamethod
local Mix = {}
Mix.__add = function(a, b) return setmetatable({ g = a.g + b.g }, Mix) end
local function mix(g) return setmetatable({ g = g }, Mix) end
local budget = mix(0.0)

for i = 1, 6 do
  local ang, g = dealer()
  local name = "hat" .. i
  add_sample_multi(name, g, ang, "hat", "hatf", -1);
  connect(name, "drums");
  budget = budget + mix(g)
end
add_sample_multi("ride", 0.5, 20.0, "ride", "ridef", -1);
connect("ride", "drums");
add_sample_lerp("kick", 1.0, 0.0, "kick", "kickf", -1, 40);
connect("kick", "drums");
budget = budget + mix(0.5) + mix(1.0)

-- level the bus by the gain actually dealt out
add_sum("drums", 2.2 / budget.g, 0.0);

-- fx chain declared out of order, sequenced by table.sort
local chain = {
  { pos = 2, name = "verb", plugin = "reverb",     wet = 0.35 },
  { pos = 1, name = "comp", plugin = "compressor", wet = 1.0 },
}
table.sort(chain, function(a, b) return a.pos < b.pos end)
local prev = "drums"
for _, fx in ipairs(chain) do
  add_lv2fx(fx.name, 1.0, 0.0, fx.wet, fx.plugin);
  connect(prev, fx.name);
  prev = fx.name
end

hit_adsr = { 0.002, 0.05, 0.0, 0.0, 0.0, 0.0 };
note_adsr = { 0.01, 0.08, 0.85, 2.0, 0.3, 0.25 };
add_synth("bass", 0.5, 0.0, "bassf", 0.6, 0.25, hit_adsr,
    1.0, 0.75, note_adsr, 0.0, {});

add_normalize("master", 1.0, 0.0);
connect(prev, "master");
connect("bass", "master");
set_output("master");
