-- Sidechain-style ducking: an ADSR envelope vertex driven by the kick
-- floww dips a looping background pad on every hit (9-element envelope
-- with negative-sustain dip shape). Port of
-- /root/reference/examples/neg-adsr-env-example.lua; assets generated on
-- first run (make_assets.py).

set_length(40.0);
set_render_samplerate(48000);
set_render_bitdepth(16);
set_output_file("outp.wav");

-- some background sample that loops
load_sample("background", "../assets/bg.wav", "");
load_sample("kick", "../assets/kick.wav", "");

load_midi_floww("bassd", "../assets/bassd.mid");

add_sample_lerp("kick", 1.0, 0.0, "kick", "bassd", -1, 40);
add_sampleloop("background", 1.0, 0.0, "background");
dip = 0.3;
adsr = { 1.0, 0.01, dip, 0.2, dip, 0.0, 0.0, 0.05, 1.0 };
add_adsr("env", 1.0, 0.0, 1.0, "bassd", false, false, -1, adsr);
add_normalize("sum", 1.0, 0.0);

connect("kick", "sum");
connect("background", "env");
connect("env", "sum");

set_output("sum");
